"""Round-3 MLP profile: fused SwiGLU fc1 kernel vs the XLA chain.

The r2 speed-of-light table left the encoder matmul path ~43 ms/B64 above
the bare-matmul floor; the MLP measured 148 TF/s vs 187 on its matmuls.
Hypothesis: the [M, 2H] fc1 intermediate + gate elementwise pass costs a
full HBM round trip (~520 MB/block). Variants at the ViT-g shape
(M=64*329, K=1536, H=4096), slope-fit timing:

  a) XLA chain: Dense(2H) -> split -> silu*g -> Dense(K)   (production)
  b) fused Pallas fc1+gate -> Dense(K)
  c) matmul floor: Dense(2H) + Dense(K) with no gate (invalid numerics,
     pure-rate reference)

Usage: python scripts/profile_mlp_r3.py   (solo on the tunneled chip)
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mipheivit_tpu.ops.mlp import swiglu_fc1, _swiglu_reference

    m, k, h = 64 * 329, 1536, 4096
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (m, k), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (k, 2 * h), jnp.bfloat16) * 0.02
    b1 = jax.random.normal(ks[2], (2 * h,), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[3], (h, k), jnp.bfloat16) * 0.02
    b2 = jax.random.normal(ks[4], (k,), jnp.bfloat16) * 0.02

    def chain_xla(x):
        hmid = _swiglu_reference(x, w1, b1.reshape(1, -1), h)
        return hmid @ w2 + b2

    def chain_fused(x):
        hmid = swiglu_fc1(x, w1, b1, impl="pallas")
        return hmid @ w2 + b2

    def chain_floor(x):
        x12 = x @ w1 + b1
        return x12[:, :h] @ w2 + b2

    # numerics check
    ref = np.asarray(chain_xla(x), np.float32)
    got = np.asarray(chain_fused(x), np.float32)
    print("maxerr fused vs xla:", float(np.max(np.abs(got - ref))),
          " scale:", float(np.max(np.abs(ref))), flush=True)

    flop = 2 * m * k * 2 * h + 2 * m * h * k  # fc1 + fc2

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

    for name, fn in (("xla chain (prod)", chain_xla),
                     ("fused fc1+gate", chain_fused),
                     ("matmul floor (no gate)", chain_floor)):
        t = slope(fn)
        print(f"{name:26s} {t*1e3:8.3f} ms   {flop/t/1e12:6.1f} TF/s"
              f"   x40 = {t*40*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
