"""Round-5: re-sweep the serving batch around B=96 under the staged kernel.

B=96 was picked in round 3 ({64: 176.5, 96: 180.8, 128: 176.6} tiles/s)
with the interleaved-emission attention kernel; staged emission (the r5
production default) shifts the per-block cost profile, so the optimum may
have moved. Sweep B in {80, 96, 112, 128} at unroll 2 (the measured
unroll winner). The attention kernel grid is (B, H/hpb) — any B works.

Usage: python scripts/profile_batch_r5.py   (solo on the tunneled chip)
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_flagship

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    model, params = build_flagship(dtype)
    print(f"backend={jax.default_backend()}", flush=True)

    def measure(batch, sizes=(4, 16)):
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3))
        times = []
        for n in sizes:
            @jax.jit
            def loop(p, x, seed, n=n):
                def body(c, i):
                    out = model.apply(
                        p, x + (seed + i.astype(jnp.float32)) * 1e-6,
                        train=False)
                    return c + out.mean(), None
                return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

            float(loop(params, x, float(batch)))        # compile + warm
            t0 = time.time()
            float(loop(params, x, float(batch) + 1.0))  # distinct seed
            times.append(time.time() - t0)
        per_batch = (times[1] - times[0]) / (sizes[1] - sizes[0])
        print(f"B={batch:4d}  {per_batch * 1e3:8.1f} ms/batch"
              f"  {batch / per_batch:7.1f} tiles/s", flush=True)

    for batch in (80, 96, 112, 128):
        try:
            measure(batch)
        except Exception as e:
            print(f"B={batch}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    print("done")


if __name__ == "__main__":
    main()
