"""Round-3: fused LN+qkv+attention sublayer kernel vs the production chain.

Production: LayerNorm -> Dense(3HD) -> attention_qkv (Pallas BSHD kernel).
Fused: ops.attn_block.ln_qkv_attention — one program per batch item, qkv
weight resident in VMEM, normed activations and the qkv buffer never reach
HBM. ViT-g flagship shape (B=64, S=329, D=1536, H=24, Dh=64).

Usage: python scripts/profile_attnblock_r3.py   (solo on the tunneled chip)
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mipheivit_tpu.ops.attention import attention_qkv
    from mipheivit_tpu.ops.attn_block import (
        ln_qkv_attention, _chain_reference)

    b, s, d, h = 64, 329, 1536, 24
    hd3 = 3 * d
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, s, d), jnp.bfloat16)
    lns = jax.random.normal(ks[1], (d,), jnp.float32) * 0.1 + 1.0
    lnb = jax.random.normal(ks[2], (d,), jnp.float32) * 0.1
    w = (jax.random.normal(ks[3], (d, hd3), jnp.bfloat16) * 0.02)
    bias = jax.random.normal(ks[4], (hd3,), jnp.bfloat16) * 0.02

    def chain_prod(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        normed = ((xf - mean) * jax.lax.rsqrt(var + 1e-6) * lns
                  + lnb).astype(x.dtype)
        qkv = normed @ w + bias
        return attention_qkv(qkv, h)

    def fused(x):
        return ln_qkv_attention(x, lns, lnb, w, bias, h)

    ref = np.asarray(_chain_reference(x, lns, lnb, w, bias, h, 1e-6),
                     np.float32)
    got = np.asarray(fused(x), np.float32)
    print("maxerr fused vs ref:", float(np.max(np.abs(got - ref))),
          " scale:", float(np.max(np.abs(ref))), flush=True)
    got2 = np.asarray(chain_prod(x), np.float32)
    print("maxerr prod vs ref:", float(np.max(np.abs(got2 - ref))),
          flush=True)

    flop = 2 * b * s * d * hd3 + 2 * 2 * b * h * s * s * 64

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

    for name, fn in (("prod chain (LN+Dense+attn)", chain_prod),
                     ("fused LN+qkv+attn kernel", fused)):
        t = slope(fn)
        print(f"{name:28s} {t*1e3:8.3f} ms   {flop/t/1e12:6.1f} TF/s"
              f"   x40 = {t*40*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
