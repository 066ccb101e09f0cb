"""Benchmark: flagship MIPHEI-ViT inference throughput (tiles/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: bf16 forward of the full generator (ViT-g/14 H-Optimus-0-sized
encoder, 1.14B params, Pallas flash attention + detail-capture decoder) on
256x256 tiles -> 16 markers, batch 64. Timing uses an on-device lax.scan
loop and a two-point slope fit so remote-dispatch latency and result-fetch
overhead cancel out (the tunneled single-chip setup adds O(100ms) per
dispatch and caches identical executions).

Baseline denominator: the reference repo never measures throughput
(BASELINE.md). Until a real A100 run of the reference ``run_inference.py``
exists, vs_baseline uses an estimated 120 tiles/s for the PyTorch reference
on A100 fp16 eager (~760 GFLOP/tile; eval loop batch 4, fp16 —
evaluation/eval_orion.py:198-209). Replace A100_TILES_PER_S when measured.
"""

import json
import time

import numpy as np

A100_TILES_PER_S = 120.0


def main():
    import jax
    import jax.numpy as jnp
    from mipheivit_tpu.config import compose
    from mipheivit_tpu.models import get_generator

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        batch, sizes = 64, (4, 16)
        cfg_model = ("myvitmatte", 256)
        dtype = "bfloat16"
    else:  # CPU smoke fallback so the script always emits a line
        batch, sizes = 2, (1, 3)
        cfg_model = ("myvitmatte", 256)
        dtype = "float32"

    cfg = compose(["+default_configs=miphei-vit"])
    model = get_generator(cfg_model[0], cfg_model[1], 3, 16, cfg, dtype=dtype)
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, cfg_model[1], cfg_model[1], 3)),
                             train=False)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    # fused per-marker heads + merged LoRA: exact same numerics, one pass
    # over the feature map instead of 16 head chains, and the rank-8
    # adapter chains folded into the qkv weights (infer/loading)
    from mipheivit_tpu.infer.loading import (
        cast_params, merge_lora, to_fast_heads)

    model, params = to_fast_heads(
        model, jax.tree.map(lambda v: v, params))
    model, params = merge_lora(model, params)
    # params stored in the compute dtype: deletes the per-batch f32->bf16
    # encoder-weight convert (bit-identical — every use casts anyway)
    params = cast_params(params, dtype)

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, cfg_model[1], cfg_model[1], 3))

    times = []
    for n in sizes:
        @jax.jit
        def loop(p, x, seed, n=n):
            def body(c, i):
                out = model.apply(p, x + (seed + i.astype(jnp.float32)) * 1e-6,
                                  train=False)
                return c + out.mean(), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]

        float(loop(params, x, 0.0))          # compile + warm
        t0 = time.time()
        float(loop(params, x, 1.0))          # distinct seed: no result cache
        times.append(time.time() - t0)

    per_batch = (times[1] - times[0]) / (sizes[1] - sizes[0])
    tiles_per_s = batch / per_batch
    print(json.dumps({
        "metric": "mIF tiles/sec/chip (256px, 16-ch, MIPHEI-ViT bf16 fwd)",
        "value": round(tiles_per_s, 1),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_s / A100_TILES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
