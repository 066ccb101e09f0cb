"""Pin the int8 serving variance: same-process bf16 / int8-enc / int8-full.

Across six solo runs of ``bench.py --int8`` on 2026-08-19 the W8A8 rate
measured 195.9 / 102.5 / 105.1 / 96.4 / 116.8 / 86.0 tiles/s — including
195.9 vs 86.0 from the *identical tree* (290e42f) 4.5 h apart — while the
bf16 row stayed at 181-184.7 in the same sessions. The variable is not
the code; it is something about the int8 executable on the chip (HBM
pressure from the decoder's int8 im2col patch buffers, power/thermal
state, or tunnel-side dispatch jitter that the slope fit fails to cancel
at int8's longer per-batch times).

This instrument removes cross-run chip state as a factor: ONE process,
interleaved A/B/A slope measurements of
  1. bf16 flagship        (the stable reference — detects chip-state drift)
  2. int8 encoder only    (quantize_encoder, decoder stays bf16)
  3. int8 enc + decoder   (the full bench.py --int8 configuration)
plus repeats, so within-process variance and between-config deltas are
separable. Run solo on the tunneled chip:
  python scripts/profile_int8_r5b.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def slope(model, params, x, sizes=(4, 16), seed0=0.0):
    import jax
    import jax.numpy as jnp

    times = []
    for n in sizes:
        @jax.jit
        def loop(p, x, seed, n=n):
            def body(c, i):
                out = model.apply(p, x + (seed + i.astype(jnp.float32))
                                  * 1e-6, train=False)
                return c + out.mean(), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

        float(loop(params, x, seed0))            # compile + warm
        t0 = time.time()
        float(loop(params, x, seed0 + 1.0))      # distinct seed: no cache
        times.append(time.time() - t0)
    return (times[1] - times[0]) / (sizes[1] - sizes[0])


def main():
    import jax

    from bench import build_flagship

    print(f"backend={jax.default_backend()}", flush=True)
    batch = 96
    dtype = "bfloat16"

    # Build once in float, derive the quantized twins from the same params
    # so all three configs share weights (and the bf16 model object).
    model, params = build_flagship(dtype, 256)
    from mipheivit_tpu.infer.loading import quantize_decoder, quantize_encoder

    enc_model, enc_params = quantize_encoder(model, params)
    full_model, full_params = quantize_decoder(enc_model, enc_params)

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3))

    configs = [("bf16      ", model, params),
               ("int8-enc  ", enc_model, enc_params),
               ("int8-full ", full_model, full_params)]
    # A/B/C then C/B/A then A/B/C: drift shows as a trend, config deltas
    # as consistent offsets. Distinct seed0 per round defeats the tunnel's
    # identical-execution cache.
    rounds = [configs, configs[::-1], configs]
    for r, cfgs in enumerate(rounds):
        for name, m, p in cfgs:
            t = slope(m, p, x, seed0=10.0 * r)
            print(f"round {r} {name} {t * 1e3:7.1f} ms/B{batch}  "
                  f"{batch / t:6.1f} tiles/s", flush=True)
    print("done")


if __name__ == "__main__":
    main()
