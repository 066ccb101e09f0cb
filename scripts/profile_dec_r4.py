"""Round-4 decoder sweep: im2col fusion convs vs XLA conv (VERDICT r3 #4).

fusion2/3 measured 7.1/10.1 ms at ~22% MXU under XLA's conv (out 64/32
lanes). MIPHEI_CONV3_IMPL=im2col routes every auto BasicConv3x3 through a
single [BHW, 9C] x [9C, K] matmul (full contraction depth, 9x patch
materialization in HBM — models/mipheivit.py::_Im2ColConv). This script
times the decoder standalone (fast heads) per impl and the full flagship
forward, so the verdict line is "decoder <= 30 ms/B64 or documented
negative".

Usage: python scripts/profile_dec_r4.py [BATCH]  (solo on the chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

IMPLS = ("xla", "im2col")


def slope(fn, args, sizes=(4, 16), reps=3):
    import jax
    import jax.numpy as jnp

    best = float("inf")
    loops = {}
    for n in sizes:
        @jax.jit
        def loop(a, seed, n=n):
            def body(c, i):
                out = fn(*(x + (seed + i.astype(jnp.bfloat16)) * 1e-3
                           for x in a))
                return c + out.mean().astype(jnp.float32), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]
        float(loop(args, 0.0))
        loops[n] = loop
    for _ in range(reps):
        times = []
        for n in sizes:
            seed = float(np.random.default_rng().integers(1, 1 << 20))
            t0 = time.time()
            float(loops[n](args, seed))
            times.append(time.time() - t0)
        best = min(best, (times[1] - times[0]) / (sizes[1] - sizes[0]))
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    import jax
    import jax.numpy as jnp
    from mipheivit_tpu.models.mipheivit import DetailCapture

    dt = jnp.bfloat16
    feats = jax.random.normal(jax.random.PRNGKey(0),
                              (batch, 16, 16, 1536), dt)
    images = jax.random.normal(jax.random.PRNGKey(1),
                               (batch, 256, 256, 3), dt)
    print(f"backend={jax.default_backend()}  B={batch}", flush=True)

    dec = DetailCapture(out_chans=16, fast_heads=True)
    variables = jax.jit(lambda f, i: dec.init(
        jax.random.PRNGKey(2), f, i, train=False))(feats, images)

    ref = None
    for impl in IMPLS:
        os.environ["MIPHEI_CONV3_IMPL"] = impl if impl != "xla" else ""

        def fwd(f, i):
            return dec.apply(variables, f, i, train=False)

        got = np.asarray(jax.jit(fwd)(feats, images), np.float32)
        if ref is None:
            ref = got
        err = float(np.max(np.abs(got - ref)))
        t = slope(fwd, (feats, images))
        print(f"decoder[{impl:7s}] {t*1e3:8.2f} ms/B{batch}  "
              f"(err vs xla {err:.5f})", flush=True)

    # full flagship forward per impl
    from bench import build_flagship

    model, params = build_flagship("bfloat16")
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, 256, 256, 3))
    for impl in IMPLS:
        os.environ["MIPHEI_CONV3_IMPL"] = impl if impl != "xla" else ""

        def fwd(p, xx):
            return model.apply(p, xx, train=False)

        t = slope(lambda xx: fwd(params, xx), (x,))
        print(f"flagship fwd[{impl:7s}] {t*1e3:8.1f} ms/B{batch}  "
              f"{batch/t:6.1f} tiles/s", flush=True)
    os.environ.pop("MIPHEI_CONV3_IMPL", None)
    print("done", flush=True)


if __name__ == "__main__":
    main()
