"""Round-3: serving batch-size / scan-unroll sweep on the flagship.

tiles/s/chip is the metric; the serving batch is ours to choose. B=64 was
inherited from round 1 — bigger batches amortize per-dispatch and
per-block fixed costs (layout changes, scan boundaries) and enlarge the
attention kernel's grid; deeper scan unroll widens XLA's cross-block
fusion window. HBM check: inference runs remat-free but stores only
per-block streaming activations, so B=128 fits easily next to the 2.3 GB
bf16 params.

Usage: python scripts/profile_batch_r3.py   (solo on the tunneled chip)
"""

import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_flagship

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    model, params = build_flagship(dtype)

    def measure(batch, unroll, sizes=(4, 16)):
        m = model.clone(vit_cfg=model.vit_cfg.replace(scan_unroll=unroll))
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3))
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
        print(f"B={batch:4d} unroll={unroll}  {per_batch*1e3:8.1f} ms/batch"
              f"  {batch/per_batch:7.1f} tiles/s", flush=True)

    for batch, unroll in ((64, 2), (96, 2), (128, 2), (128, 4), (64, 4)):
        try:
            measure(batch, unroll)
        except Exception as e:
            print(f"B={batch} unroll={unroll}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
