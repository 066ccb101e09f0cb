"""Benchmark: flagship MIPHEI-ViT inference throughput (tiles/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default mode — bare-forward ceiling: bf16 forward of the full generator
(ViT-g/14 H-Optimus-0-sized encoder, 1.14B params, Pallas flash attention +
detail-capture decoder) on 256x256 tiles -> 16 markers, batch 64. Timing
uses an on-device lax.scan loop and a two-point slope fit so
remote-dispatch latency and result-fetch overhead cancel out (the tunneled
single-chip setup adds O(100ms) per dispatch and caches identical
executions).

``--wsi`` mode — the metric BASELINE.json actually names ("mIF
tiles/sec/chip, whole-slide sliding-window inference"): builds a synthetic
H&E pyramid (default 4096^2), runs the full 3-stage serving pipeline
(reader threads -> async device dispatch -> feathered stitch ->
band-streamed PyramidWriter) and reports stitched tiles/s with the
decode / transfer / stitch split, so the tunneled dev box's host<->device
artifact is isolated as its own line (on a host-local TPU VM the transfer
rides PCIe/ICI and this term shrinks by orders of magnitude).

Baseline denominator: the reference repo never measures throughput
(BASELINE.md). Until a real A100 run of the reference ``run_inference.py``
exists, vs_baseline uses an estimated 120 tiles/s for the PyTorch reference
on A100 fp16 eager (~760 GFLOP/tile; eval loop batch 4, fp16 —
evaluation/eval_orion.py:198-209). Replace A100_TILES_PER_S when measured.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

A100_TILES_PER_S = 120.0


def build_flagship(dtype: str, img_size: int = 256, nc_out: int = 16,
                   encoder: str = "hoptimus0", int8: bool = False):
    """Flagship generator + serving transforms (fused heads, merged LoRA,
    compute-dtype params), as run_inference.py serves it."""
    import jax
    import jax.numpy as jnp
    from mipheivit_tpu.config import compose
    from mipheivit_tpu.models import get_generator

    cfg = compose(["+default_configs=miphei-vit",
                   f"++model.encoder.encoder_name={encoder}"])
    model = get_generator("myvitmatte", img_size, 3, nc_out, cfg, dtype=dtype)
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, img_size, img_size, 3)),
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
    if int8:
        from mipheivit_tpu.infer.loading import (quantize_decoder,
                                                 quantize_encoder)

        model, params = quantize_encoder(model, params)
        model, params = quantize_decoder(model, params)
    return model, params


def main(int8: bool = False):
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # B=96 measured fastest (180.8 tiles/s vs 176.5 at B=64 and 176.6
        # at B=128 — scripts/profile_batch_r3.py); serving batch is free
        batch, sizes = 96, (4, 16)
        cfg_model = ("myvitmatte", 256)
        dtype = "bfloat16"
    else:  # CPU smoke fallback so the script always emits a line
        batch, sizes = 2, (1, 3)
        cfg_model = ("myvitmatte", 256)
        dtype = "float32"

    model, params = build_flagship(dtype, cfg_model[1], int8=int8)

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, cfg_model[1], cfg_model[1], 3))

    loops = {}
    for n in sizes:
        @jax.jit
        def loop(p, x, seed, n=n):
            def body(c, i):
                out = model.apply(p, x + (seed + i.astype(jnp.float32)) * 1e-6,
                                  train=False)
                return c + out.mean(), None
            return jax.lax.scan(body, 0.0, jnp.arange(n))[0]
        loops[n] = loop
        float(loop(params, x, -float(n)))    # compile + warm

    # int8 executables show random multi-second per-execution stalls on
    # the tunneled dev chip (bf16 is stable to 0.3% — BASELINE.md "int8
    # W8A8 serving: measured negative"), so a single slope fit can
    # fabricate any number from ~50 to ~430 tiles/s. Take the median of
    # several fits and surface the spread; one rep suffices for bf16.
    reps = 5 if (int8 and on_tpu) else 1
    fits = []
    for r in range(reps):
        times = []
        for n in sizes:
            t0 = time.time()
            # distinct seed every execution: the dev tunnel caches
            # identical executions
            float(loops[n](params, x, 1.0 + 10.0 * r))
            times.append(time.time() - t0)
        fits.append((times[1] - times[0]) / (sizes[1] - sizes[0]))
    usable = sorted(t for t in fits if t > 0) or sorted(fits)
    per_batch = usable[len(usable) // 2]
    if reps > 1:
        spread = ", ".join(f"{t * 1e3:.0f}" for t in sorted(fits))
        print(f"[bench] int8 slope fits (ms/batch, sorted): {spread} — "
              f"median reported; treat a wide spread as an unreliable "
              f"measurement environment", file=sys.stderr)
    tiles_per_s = batch / per_batch
    short = {"bfloat16": "bf16", "float32": "f32"}.get(dtype, dtype)
    kind = "int8 W8A8 serving fwd" if int8 else f"{short} fwd"
    if on_tpu:
        # MFU vs the v5e bf16 peak is the honest primary efficiency metric
        # while the A100 denominator stays an estimate (BASELINE.md):
        # ~760 GFLOP/tile (ViT-g 740 + decoder ~20) against 197 TFLOP/s.
        mfu = tiles_per_s * 760e9 / 197e12
        print(f"[bench] MFU vs v5e bf16 peak: {100 * mfu:.1f}% "
              f"({tiles_per_s:.1f} tiles/s x 760 GFLOP / 197 TFLOP/s)",
              file=sys.stderr)
    if not on_tpu:
        kind += ", CPU smoke — not a chip measurement"
    result = {
        "metric": f"mIF tiles/sec/chip (256px, 16-ch, MIPHEI-ViT {kind})",
        "value": round(tiles_per_s, 1),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_s / A100_TILES_PER_S, 3),
    }
    if reps > 1 and (min(fits) <= 0 or max(fits) > 1.5 * usable[0]):
        result["note"] = (
            "UNRELIABLE: slope fits scattered "
            f"{', '.join(f'{t * 1e3:.0f}' for t in sorted(fits))} ms/batch "
            "(per-execution stalls — see BASELINE.md int8 verdict); "
            "median of positive fits reported")
    print(json.dumps(result))
    return result


def wsi_main(slide_px: int, batch_size: int = 0, fetch_workers: int = 4):
    """Whole-slide stitched serving bench (BASELINE.json's metric)."""
    import tempfile
    from pathlib import Path

    import jax

    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer.wsi import wsi_inference
    from mipheivit_tpu.slideio import write_pyramid

    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else "float32"
    # CPU smoke: ViT-base encoder + small slide so the script always
    # finishes; the measured metric is only meaningful on the TPU flagship
    encoder = "hoptimus0" if on_tpu else "sp85m"
    if not on_tpu:
        slide_px = min(slide_px, 512)
    batch = batch_size or (64 if on_tpu else 4)

    tmp = Path(tempfile.mkdtemp(prefix="bench_wsi_"))
    rng = np.random.default_rng(0)
    # tissue-looking H&E noise (structured so JPEG-free TIFF sizes stay sane)
    he = rng.integers(120, 230, (3, slide_px, slide_px), dtype=np.uint8)
    slide = str(tmp / "synthetic_he.ome.tiff")
    write_pyramid(slide, he, n_levels=3, tile_size=512)

    model, params = build_flagship(dtype, encoder=encoder)
    norm = Normalizer({"mean": [180.0, 140.0, 170.0],
                       "std": [40.0, 45.0, 35.0]}, mode="he")
    markers = [f"m{i}" for i in range(16)]
    stats: dict = {}
    out = str(tmp / "pred.ome.tiff")
    wsi_inference(model, params, slide, out, markers, norm,
                  tile_size=256, overlap=64, batch_size=batch,
                  tissue_only=False, stats=stats, fetch_uint8=True,
                  fetch_workers=fetch_workers)

    # joint fallback: with a single batch there is no steady window, so use
    # the full wall clock *and* the full tile count together (mixing the
    # near-zero steady_s with n_tiles would inflate the rate)
    steady = stats["steady_s"]
    steady_tiles = stats["steady_tiles"]
    if steady_tiles <= 0 or steady <= 0:
        steady, steady_tiles = stats["wall_s"], stats["n_tiles"]
    tiles_per_s = steady_tiles / steady
    nb = max(stats["n_batches"], 1)
    nsb = max(stats.get("steady_batches", nb - 1), 1)
    # host-pipeline bound with the tunneled-transfer artifact removed: what
    # the same loop does when result fetches ride PCIe (host-local TPU VM).
    # device_wait_s already excludes the compile-absorbing first batch, so
    # the subtraction matches the steady window.
    no_transfer = max(steady - stats["device_wait_s"], 1e-9)
    no_transfer_line = (
        f"{steady_tiles / no_transfer:.1f} tiles/s"
        if no_transfer > 0.01 * steady else "n/a (device-wait is the "
        "compute itself off-TPU)")
    print(
        f"[wsi-bench] slide {slide_px}^2, {stats['n_tiles']} tiles, "
        f"{nb} batches of {batch}\n"
        f"[wsi-bench] steady wall {steady:.2f} s -> "
        f"{tiles_per_s:.1f} tiles/s stitched\n"
        f"[wsi-bench] per-batch split: read-starvation "
        f"{1000 * stats['read_wait_s'] / nb:.1f} ms, device-wait "
        f"{1000 * stats['device_wait_s'] / nsb:.1f} ms (tunnel artifact on "
        f"the dev box), stitch {1000 * stats['stitch_s'] / nb:.1f} ms, "
        f"finalize {stats['finalize_s']:.2f} s\n"
        f"[wsi-bench] transfer-artifact-free bound: {no_transfer_line}",
        file=sys.stderr)
    row = {
        "metric": "mIF tiles/sec/chip (whole-slide stitched serving, "
                  f"{slide_px}px synthetic slide)",
        "value": round(tiles_per_s, 1),
        "unit": "tiles/s",
        "vs_baseline": round(tiles_per_s / A100_TILES_PER_S, 3),
    }
    if no_transfer > 0.01 * steady:
        # on this dev box the result fetch rides a slow tunnel; the bound
        # below removes exactly that term (it is what the same loop does
        # on a host-local TPU VM where fetches ride PCIe)
        row["note"] = (
            f"device-wait {1000 * stats['device_wait_s'] / nsb:.0f} ms/"
            f"batch is dev-tunnel transfer; artifact-free bound "
            f"{steady_tiles / no_transfer:.1f} tiles/s")
    print(json.dumps(row))


def _tpu_probe_once(timeout_s: int = 120) -> bool:
    """One device-attach probe in a subprocess with a hard timeout.

    The axon tunnel relay can die (observed mid-round 2026-08-17), and a
    dead relay makes backend *initialization* block forever — in-process
    try/except can't catch that, so the probe must be a killable child.
    """
    import subprocess

    try:
        res = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s)
        return res.returncode == 0 and "ok" in res.stdout
    except subprocess.TimeoutExpired:
        return False


def _tpu_reachable() -> bool:
    """Probe with retry/backoff so one transient tunnel outage does not
    void the round's official benchmark artifact with a CPU smoke.

    Retries for BENCH_TPU_RETRY_S seconds total (default 20 min; set 0 for
    a single probe), sleeping between attempts. Each attempt is a
    short-lived subprocess, so a hung probe can never linger as a second
    TPU client and wedge the tunnel once it recovers.
    """
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    budget_s = float(os.environ.get("BENCH_TPU_RETRY_S", "1200"))
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        if _tpu_probe_once():
            return True
        remaining = deadline - time.time()
        if remaining <= 0:
            return False
        sleep_s = min(90.0 * attempt, 300.0, remaining)
        print(f"[bench] TPU attach probe {attempt} failed; retrying in "
              f"{sleep_s:.0f}s ({remaining:.0f}s budget left)",
              file=sys.stderr)
        time.sleep(sleep_s)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="opt-in W8A8 serving mode (quantize_encoder)")
    ap.add_argument("--wsi", action="store_true",
                    help="bench the stitched whole-slide serving path")
    ap.add_argument("--slide-px", type=int, default=4096)
    ap.add_argument("--batch-size", type=int, default=0)
    ap.add_argument("--fetch-workers", type=int, default=4,
                    help="concurrent device->host result fetches in the WSI "
                         "pipeline (1 = serial drain)")
    ap.add_argument("--headline-only", action="store_true",
                    help="emit only the bf16 forward headline (skip the "
                         "int8 and stitched-WSI auxiliary rows)")
    args = ap.parse_args()
    ambient_cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    if not ambient_cpu and not _tpu_reachable():
        print("[bench] TPU unreachable (tunnel relay down?) — falling back "
              "to a CPU smoke run; the emitted number is NOT a chip "
              "measurement", file=sys.stderr)
        # re-exec: the sitecustomize captures the TPU-claim trigger at
        # interpreter start, so an in-process env pop is too late
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    if args.wsi:
        wsi_main(args.slide_px, args.batch_size, args.fetch_workers)
    elif args.int8:
        main(int8=True)
    else:
        # default run = full report (VERDICT r4 #4: the BASELINE.json
        # metric — stitched whole-slide serving — must be driver-visible,
        # not only the bare-forward ceiling). Headline first so a mid-run
        # timeout/flake still leaves a parsable line; auxiliary rows are
        # individually guarded; headline re-printed last so the driver's
        # last-JSON-line parse stays the bf16 forward row.
        headline = main()
        on_tpu_now = not ambient_cpu and os.environ.get(
            "JAX_PLATFORMS", "") != "cpu"
        if on_tpu_now and not args.headline_only:
            # int8 is NOT part of the default report: on the tunneled dev
            # chip any int8-dot executable shows random multi-second stalls
            # (bf16 is stable to 0.3% in the same process) so its measured
            # rate is noise — see BASELINE.md "int8 W8A8 serving: measured
            # negative" and logs/chip_r5/int8_steady.log. Re-test with an
            # explicit `bench.py --int8` on a host-local TPU VM.
            for name, fn in (
                ("wsi", lambda: wsi_main(2048, args.batch_size)),
            ):
                try:
                    fn()
                except Exception as e:  # noqa: BLE001 — aux row only
                    print(f"[bench] auxiliary {name} bench failed: {e!r}",
                          file=sys.stderr)
            print(json.dumps(headline))
