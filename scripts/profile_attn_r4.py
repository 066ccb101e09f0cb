"""Round-4 attention sweep: kernel emission variants at the flagship shape.

VERDICT r3 #2 target: close the 34 -> ~25 ms/B64 attention gap. hpb/block
sweeps are exhausted (r3: hpb=12 is the measured layout optimum); the
residual is MXU efficiency at the [336, 64, 336] per-head dots (~34 TF/s
vs the ~98 TF/s K=64-constrained ceiling). Two hypotheses, implemented as
switchable kernels in ops/attention.py (MIPHEI_ATTN_VARIANT):

* staged — same math, dots emitted in waves (all qk -> all softmax ->
  all pv): probes whether Mosaic schedules adjacent dots back-to-back.
* paired_bd — the VERDICT suggestion: two heads' matmuls folded into one
  full-depth K=128 contraction via block-diagonal operands. Issued FLOPs
  double (zero blocks), so cycle-neutral in theory; measures whether
  fewer, larger dots pipeline better than d=64 pairs.

Reports kernel-level ms/block + TF/s (effective FLOPs, not issued) and
the end-to-end flagship forward per variant.

Usage: python scripts/profile_attn_r4.py   (solo on the tunneled chip)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

VARIANTS = ("interleaved", "staged", "paired_bd")


def main():
    import jax
    import jax.numpy as jnp
    from mipheivit_tpu.ops import attention as A

    b, h, s, d = 64, 24, 329, 64
    hd = h * d
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (b, s, 3 * hd), jnp.bfloat16)

    def slope(fn, sizes=(8, 40), reps=3):
        best = float("inf")
        loops = {}
        for n in sizes:
            @jax.jit
            def loop(x, seed, n=n):
                def body(c, i):
                    out = fn(x + (seed + i.astype(jnp.bfloat16)) * 1e-3)
                    return c + out.mean().astype(jnp.float32), None
                return jax.lax.scan(body, 0.0, jnp.arange(n))[0]
            float(loop(qkv, 0.0))  # compile
            loops[n] = loop
        for _ in range(reps):
            times = []
            for n in sizes:
                seed = float(np.random.default_rng().integers(1, 1 << 20))
                t0 = time.time()
                float(loops[n](qkv, seed))
                times.append(time.time() - t0)
            best = min(best, (times[1] - times[0]) / (sizes[1] - sizes[0]))
        return best

    flop = 2 * 2 * b * h * s * s * d     # effective (not issued)
    print(f"backend={jax.default_backend()}  B={b} H={h} S={s} D={d}",
          flush=True)

    ref = None
    for variant in VARIANTS:
        os.environ["MIPHEI_ATTN_VARIANT"] = variant
        try:
            fn = lambda x: A.attention_qkv(x, h, impl="flash")
            got = np.asarray(fn(qkv), np.float32)
            if ref is None:
                ref = got
            err = float(np.max(np.abs(got - ref)))
            t = slope(fn)
            print(f"attention_qkv[{variant:11s}] {t*1e3:8.3f} ms/B64  "
                  f"{flop/t/1e12:6.1f} TF/s  (err vs interleaved "
                  f"{err:.5f})", flush=True)
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    os.environ["MIPHEI_ATTN_VARIANT"] = "interleaved"

    # end-to-end: a winner must also win in the scanned flagship forward
    from bench import build_flagship

    model, params = build_flagship("bfloat16")
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 256, 256, 3))
    for variant in VARIANTS:
        os.environ["MIPHEI_ATTN_VARIANT"] = variant

        def fwd(p, xx):
            return model.apply(p, xx, train=False)

        try:
            t = slope_e2e(fwd, params, x)
            print(f"flagship fwd[{variant:11s}] {t*1e3:8.1f} ms/B64  "
                  f"{64/t:6.1f} tiles/s", flush=True)
        except Exception as e:
            print(f"e2e {variant}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    os.environ["MIPHEI_ATTN_VARIANT"] = "interleaved"
    print("done", flush=True)


def slope_e2e(fwd, params, x, sizes=(4, 16)):
    import jax
    import jax.numpy as jnp

    times = []
    loops = {}
    for n in sizes:
        @jax.jit
        def loop(p, x, seed, n=n):
            def body(c, i):
                out = fwd(p, x + (seed + i.astype(jnp.float32)) * 1e-6)
                return c + out.mean(), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]
        float(loop(params, x, 0.0))
        loops[n] = loop
    for n in sizes:
        t0 = time.time()
        float(loops[n](params, x, 1.0))
        times.append(time.time() - t0)
    return (times[1] - times[0]) / (sizes[1] - sizes[0])


if __name__ == "__main__":
    main()
