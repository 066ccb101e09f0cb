"""Round-3: LN-fused matmul kernels vs the XLA chains (ViT-g shapes).

  1) qkv sublayer:  LN -> Dense(4608) -> attention_qkv
     vs              ln_matmul(4608) -> attention_qkv
  2) MLP sublayer:  LN -> fc1(8192) -> gate -> fc2
     vs              swiglu_fc1(ln=...) -> fc2

Usage: python scripts/profile_lnfuse_r3.py   (solo on the tunneled chip)
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mipheivit_tpu.ops.attention import attention_qkv
    from mipheivit_tpu.ops.mlp import ln_matmul, swiglu_fc1, _ln_reference

    b, s, d, h = 64, 329, 1536, 24
    hid = 4096
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, s, d), jnp.bfloat16)
    lns = jax.random.normal(ks[1], (d,), jnp.float32) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (d,), jnp.float32) * 0.1
    wqkv = jax.random.normal(ks[3], (d, 3 * d), jnp.bfloat16) * 0.02
    bqkv = jax.random.normal(ks[4], (3 * d,), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(ks[5], (d, 2 * hid), jnp.bfloat16) * 0.02
    b1 = jax.random.normal(ks[6], (2 * hid,), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[7], (hid, d), jnp.bfloat16) * 0.02

    def flax_ln(x):
        return _ln_reference(x, lns, lnb, 1e-6)

    def qkv_chain(x):
        qkv = flax_ln(x) @ wqkv + bqkv
        return attention_qkv(qkv, h)

    def qkv_fused(x):
        qkv = ln_matmul(x, lns, lnb, wqkv, bqkv, impl="pallas")
        return attention_qkv(qkv, h)

    def mlp_chain(x):
        y = flax_ln(x)
        x12 = y @ w1 + b1
        g = jax.nn.silu(x12[..., :hid]) * x12[..., hid:]
        return g @ w2

    def mlp_fused(x):
        g = swiglu_fc1(x, w1, b1, ln=(lns, lnb), impl="pallas")
        return g @ w2

    for name, fa, fb in (("qkv", qkv_chain, qkv_fused),
                         ("mlp", mlp_chain, mlp_fused)):
        ra = np.asarray(fa(x), np.float32)
        rb = np.asarray(fb(x), np.float32)
        print(f"{name} maxerr {float(np.max(np.abs(ra - rb))):.5f} "
              f"scale {float(np.max(np.abs(ra))):.3f}", flush=True)

    def slope(fn, sizes=(8, 40), reps=2):
        loops = {}
        for n in sizes:
            @jax.jit
            def loop(x, seed, n=n):
                def body(c, i):
                    out = fn(x + (seed + i.astype(jnp.bfloat16)) * 1e-3)
                    return c + out.mean().astype(jnp.float32), None
                return jax.lax.scan(body, 0.0, jnp.arange(n))[0]
            float(loop(x, 0.0))
            loops[n] = loop
        best = float("inf")
        for _ in range(reps):
            t = []
            for n in sizes:
                seed = float(np.random.default_rng().integers(1, 1 << 20))
                t0 = time.time()
                float(loops[n](x, seed))
                t.append(time.time() - t0)
            best = min(best, (t[1] - t[0]) / (sizes[1] - sizes[0]))
        return best

    for name, fn in (("qkv chain (LN+Dense+attn)", qkv_chain),
                     ("qkv ln_matmul fused      ", qkv_fused),
                     ("mlp chain (LN+fc1+g+fc2) ", mlp_chain),
                     ("mlp swiglu_fc1(ln) fused ", mlp_fused)):
        t = slope(fn)
        print(f"{name} {t*1e3:8.3f} ms   x40 = {t*40*1e3:6.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
