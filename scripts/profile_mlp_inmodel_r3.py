"""In-model A/B of the SwiGLU fc1 impl: fused Pallas kernel vs XLA chain.

The standalone chain microbench (profile_mlp_r3.py) favored the fused
kernel, but the first full-model bench after wiring it regressed 176.9 ->
162.7 tiles/s (possibly load-polluted). This times the COMPLETE flagship
forward (B=64, bf16, fused heads + merged LoRA, same as bench.py) with
``ViTConfig.mlp_impl`` flipped between "pallas" and "xla" in one process,
so layout effects at the scan boundaries are included and chip/tunnel
conditions are identical.

Usage: python scripts/profile_mlp_inmodel_r3.py   (solo on the chip)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_flagship

    batch, sizes = (64, (4, 16)) if jax.default_backend() == "tpu" \
        else (2, (1, 3))
    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    model, params = build_flagship(dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3))

    for impl in ("pallas", "xla"):
        m = model.clone(vit_cfg=model.vit_cfg.replace(mlp_impl=impl))
        times = []
        for n in sizes:
            @jax.jit
            def loop(p, x, seed, n=n, m=m):
                def body(c, i):
                    out = m.apply(p, x + (seed + i.astype(jnp.float32)) * 1e-6,
                                  train=False)
                    return c + out.mean(), None
                return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

            float(loop(params, x, 0.0))
            t0 = time.time()
            float(loop(params, x, 1.0))
            times.append(time.time() - t0)
        per_batch = (times[1] - times[0]) / (sizes[1] - sizes[0])
        print(f"mlp_impl={impl:7s} {per_batch*1e3:8.1f} ms/B{batch}  "
              f"{batch/per_batch:7.1f} tiles/s", flush=True)


if __name__ == "__main__":
    main()
