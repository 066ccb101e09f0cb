"""Decoder ablation profiler (DetailCapture at flagship shape).

Usage: python scripts/profile_dec.py VARIANT [BATCH]
Variants: full, fast (fused heads), noheads, convstream, fusions
"""

import sys
import time

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "fast"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from mipheivit_tpu.models.mipheivit import (
        BatchedSegHeads, ConvStream, DetailCapture, FusionBlock)

    dt = jnp.bfloat16
    feats = jax.random.normal(jax.random.PRNGKey(0), (batch, 16, 16, 1536), dt)
    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3), dt)

    class NoHeads(nn.Module):
        @nn.compact
        def __call__(self, features, images, train=False):
            details = ConvStream((48, 96, 192), name="convstream")(images, train)
            x = features
            for i, ch in enumerate((256, 128, 64, 32)):
                x = FusionBlock(ch, name=f"fusion_blks_{i}")(x, details[4 - i - 1], train)
            return x

    class FusionsOnly(nn.Module):
        @nn.compact
        def __call__(self, features, images, train=False):
            nb = features.shape[0]
            details = [images,
                       jnp.zeros((nb, 128, 128, 48), dt),
                       jnp.zeros((nb, 64, 64, 96), dt),
                       jnp.zeros((nb, 32, 32, 192), dt)]
            x = features
            for i, ch in enumerate((256, 128, 64, 32)):
                x = FusionBlock(ch, name=f"fusion_blks_{i}")(x, details[4 - i - 1], train)
            return x

    class HeadsOnly(nn.Module):
        @nn.compact
        def __call__(self, features, images, train=False):
            x = images[..., :1] * jnp.ones((1, 1, 1, 32), dt)
            return BatchedSegHeads(16, "tanh", name="heads")(x, train)

    if variant == "fast":
        model = DetailCapture(16, fast_heads=True)
    elif variant == "full":
        model = DetailCapture(16, fast_heads=False)
    elif variant == "noheads":
        model = NoHeads()
    elif variant == "fusions":
        model = FusionsOnly()
    elif variant == "heads":
        model = HeadsOnly()
    else:
        raise SystemExit(f"unknown variant {variant}")

    params = jax.jit(lambda k: model.init(k, feats[:1], images[:1]))(
        jax.random.PRNGKey(2))
    jax.block_until_ready(params)

    times = []
    for n in (2, 8):
        @jax.jit
        def loop(p, f, im, seed, n=n):
            def body(c, i):
                out = model.apply(p, f + (seed + i.astype(dt)) * 1e-3, im)
                return c + out.mean().astype(jnp.float32), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

        float(loop(params, feats, images, 0.0))
        t0 = time.time()
        float(loop(params, feats, images,
                   float(np.random.default_rng().integers(1, 1 << 20))))
        times.append(time.time() - t0)
    per = (times[1] - times[0]) / 6
    print(f"decoder[{variant}] B={batch}: {per*1e3:.1f} ms/batch")


if __name__ == "__main__":
    main()
