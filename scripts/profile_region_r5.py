"""On-chip whole-region forward latency (VERDICT r4 #9).

The whole-region path (1024-px region, >5k tokens through the long-seq
Pallas flash kernel, bicubic pos-embed re-grid to the /16 decoder grid)
is correctness-locked by tests/test_whole_region.py on CPU interpret;
this script produces the missing single-chip perf datum: flagship
MIPHEI-ViT (ViT-g encoder, 16 markers) forward at region scale, bf16,
B=1 and B=2, slope-fit timing.

Reference framing: the reference tiles slides into 256-px crops because
torch SDPA at region scale would materialize [S,S] probs
(src/dataset.py crops); the equivalent work here is 16 tiles/region.

Run on an idle chip:  python scripts/profile_region_r5.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# patch-14 flagship: 1024 -> 73x73 grid = 5329 tokens (+5 prefix);
# 2048 -> 146x146 = 21316 tokens (the scale that motivates seq-sharding).
# check_input_size requires a power-of-2 region; the conv patch embed
# drops the remainder exactly like torch's floor conv arithmetic.
REGION = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def slope(fn, params, x, sizes=(2, 6)):
    """Two-point slope fit; params ride as jit ARGUMENTS (a closure would
    bake the 2.3 GB param tree into the executable as captured constants,
    which the tunneled dev box then re-uploads per compile at ~7 MB/s)."""
    import jax
    import jax.numpy as jnp

    times = []
    for n in sizes:
        @jax.jit
        def loop(p, a, seed, n=n):
            def body(c, i):
                out = fn(p, a + (seed + i.astype(jnp.float32)) * 1e-6)
                return c + out.mean(), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

        float(loop(params, x, 0.0))
        t0 = time.time()
        float(loop(params, x, 1.0))
        times.append(time.time() - t0)
    return (times[1] - times[0]) / (sizes[1] - sizes[0])


def main():
    import jax

    from bench import build_flagship

    backend = jax.default_backend()
    dtype = "bfloat16" if backend == "tpu" else "float32"
    model, params = build_flagship(dtype, REGION)
    grid = model.vit_cfg.grid_size
    tokens = grid[0] * grid[1] + model.vit_cfg.num_prefix_tokens
    print(f"backend={backend}  region={REGION}px  grid={grid}  "
          f"tokens={tokens}")
    assert tokens > 4096, "not a long-seq shape"

    # at 2048 (21k tokens) a single region is already a full-chip batch
    for b in ((1, 2) if REGION <= 1024 else (1,)):
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (b, REGION, REGION, 3))
        t = slope(lambda p, xx: model.apply(p, xx, train=False), params, x)
        # equivalent 256-px tile work: (REGION/256)^2 tiles per region
        eq_tiles = b * (REGION / 256.0) ** 2
        print(f"region fwd B={b}: {t * 1e3:8.1f} ms/batch   "
              f"{b / t:6.2f} regions/s   "
              f"(~{eq_tiles / t:6.1f} 256px-tile-equivalents/s)")
    print("done")


if __name__ == "__main__":
    main()
