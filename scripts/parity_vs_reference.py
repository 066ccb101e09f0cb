"""One-command numerical parity vs the PyTorch reference.

The north-star claim (BASELINE.json) is per-marker Pearson within 0.5% of
the reference's outputs on the same tiles. This harness closes that check
the day released weights are reachable:

  python scripts/parity_vs_reference.py --checkpoint_dir D --tiles T \
      [--reference_outputs R] [--out CSV]

* ``--checkpoint_dir``: a reference-format checkpoint dir (config.yaml +
  model.safetensors [+ channel_stats.json]), e.g. an unpacked release from
  HF ``Estabousi/MIPHEI-vit`` (reference: README.md:66-93).
* ``--tiles``: a directory of H&E tiles (png/jpg/tif) or a CSV with an
  ``image_path`` column.
* ``--reference_outputs``: directory of the reference pipeline's uint8
  prediction TIFFs named after the tiles (what SavePredictionsCallback
  writes — reference: src/callbacks.py:336-351). When omitted, the
  reference model is rebuilt **in-process with torch** (CPU, fp32) from
  the same checkpoint via the timm-layout oracle modules and run on the
  same tiles — no torch checkpoint round trip needed.

Output: per-marker Pearson r + SSIM CSV (plus the mean row) and a PASS /
FAIL line against the 0.5% budget (min Pearson >= 0.995).
Reference comparison points: evaluation/eval_orion.py:194-242 (the CSVs
shipped with each released checkpoint).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

TILE_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff")


def list_tiles(tiles_arg: str):
    p = Path(tiles_arg)
    if p.is_file() and p.suffix == ".csv":
        df = pd.read_csv(p)
        return [str(v) for v in df["image_path"]]
    if p.is_dir():
        return sorted(str(f) for f in p.iterdir()
                      if f.suffix.lower() in TILE_EXTS)
    raise FileNotFoundError(f"--tiles {tiles_arg} is neither a CSV nor a dir")


def load_tile(path: str) -> np.ndarray:
    from mipheivit_tpu.slideio import read_image

    return np.asarray(read_image(path))


def build_ours(cfg, width: int, nc_out: int, checkpoint_dir: str):
    import jax

    from mipheivit_tpu.infer.loading import (
        cast_params, load_generator, merge_lora)

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    model, variables = load_generator(cfg, checkpoint_dir, (width, width),
                                      nc_out, dtype=dtype, fast_heads=True)
    if hasattr(model, "vit_cfg") and model.vit_cfg.lora_rank > 0:
        model, variables = merge_lora(model, variables)
    variables = cast_params(variables, dtype)
    return jax.jit(lambda x: model.apply(variables, x, train=False))


def build_torch_oracle(cfg, width: int, nc_out: int, checkpoint_dir: str,
                       encoder_ckpt: str | None):
    """Reference model rebuilt in torch from the same checkpoint (the
    timm-layout oracle mirrors timm ViT + the ViTMatte decoder —
    reference: src/generators/mipheivit.py:96-233)."""
    import torch

    from mipheivit_tpu.models.foundation import get_encoder_spec
    from mipheivit_tpu.models.import_weights import load_state_dict
    from torch_oracle import OracleDecoder, OracleMiphei, OracleViT

    spec = get_encoder_spec(
        cfg.select("model.encoder.encoder_name", "hoptimus0"),
        (width, width))
    vc = spec.vit_cfg
    vit = OracleViT(img_size=width, patch=vc.patch_size, dim=vc.embed_dim,
                    depth=vc.depth, heads=vc.num_heads,
                    hidden=vc.mlp_hidden_dim, reg_tokens=vc.reg_tokens,
                    swiglu=vc.mlp_type == "swiglu",
                    ls=vc.init_values is not None,
                    no_embed_class=vc.no_embed_class)
    grid = width // vc.patch_size
    target = width // 16
    dec = OracleDecoder(vc.embed_dim, nc_out)
    oracle = OracleMiphei(vit, dec, num_prefix=vc.num_prefix_tokens,
                          grid=grid, target_grid=target).eval()

    state = load_state_dict(str(Path(checkpoint_dir) / "model.safetensors"))
    state = {k[len("generator."):] if k.startswith("generator.") else k: v
             for k, v in state.items()}
    # unwrap QkvWithLoRA (reference: src/generators/lora.py:36-45): the
    # wrapped fused projection lives at attn.qkv.qkv.*
    state = {k.replace(".attn.qkv.qkv.", ".attn.qkv."): v
             for k, v in state.items()}
    if encoder_ckpt:
        enc = load_state_dict(encoder_ckpt)
        state.update({f"encoder.vit.{k}": v for k, v in enc.items()
                      if f"encoder.vit.{k}" not in state})
    tensors = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    missing, unexpected = oracle.load_state_dict(tensors, strict=False)
    missing = [k for k in missing if "lora" not in k]
    if missing:
        print(f"[oracle] WARNING: {len(missing)} missing keys "
              f"(first: {missing[:3]})")
    lora = {k: v for k, v in tensors.items() if ".lora_" in k}
    if lora:
        _merge_lora_into_oracle(oracle, lora)
    return oracle


def _merge_lora_into_oracle(oracle, lora):
    """Fold q/v LoRA adapters into the oracle's qkv weights
    (W_q += (A @ B).T * alpha — reference: src/generators/lora.py:21-33)."""
    import torch

    for i, blk in enumerate(oracle.encoder.vit.blocks):
        for which, off in (("lora_q", 0), ("lora_v", 2)):
            ka = f"encoder.vit.blocks.{i}.attn.qkv.{which}.A"
            kb = f"encoder.vit.blocks.{i}.attn.qkv.{which}.B"
            if ka not in lora:
                continue
            delta = (lora[ka].float() @ lora[kb].float()).T
            d = delta.shape[0]
            with torch.no_grad():
                blk.attn.qkv.weight[off * d:(off + 1) * d] += delta


def pearson_per_marker(pred_sum, ref_sum, pred_sq, ref_sq, cross, n):
    cov = cross / n - (pred_sum / n) * (ref_sum / n)
    var_p = pred_sq / n - (pred_sum / n) ** 2
    var_r = ref_sq / n - (ref_sum / n) ** 2
    return cov / np.sqrt(np.maximum(var_p * var_r, 1e-20))


def golden_check() -> int:
    """Run the committed golden-fixture lock (same fixture as
    tests/test_model_parity.py::test_flagship_geometry_golden_fixture):
    deterministic torch-layout checkpoint -> import -> forward at flagship
    geometry vs frozen torch-oracle activations. Torch-free; exercises the
    exact import path a released checkpoint takes."""
    import json

    from make_parity_fixtures import TAPS, run_jax

    path = REPO / "tests/fixtures/parity_flagship_geom.npz"
    z = np.load(path)
    meta = json.loads(str(z["meta"]))
    enc_j, taps_j, out_j = run_jax(
        [(k, tuple(s)) for k, s in meta["keys_shapes"]])
    tol = meta["tol"]
    checks = [(f"tap{i}", taps_j[k], z[f"tap{i}"], tol["tap"])
              for k, i in enumerate(TAPS)]
    checks += [("enc", enc_j, z["enc"], tol["enc"]),
               ("out", out_j, z["out"], tol["out"])]
    ok = True
    for name, got, want, budget in checks:
        d = float(np.max(np.abs(got - want)))
        line_ok = d <= budget
        ok &= line_ok
        print(f"golden {name}: max|diff| = {d:.2e} "
              f"(budget {budget:.0e}) {'OK' if line_ok else 'FAIL'}")
    print("golden fixture:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main(argv=None):
    parser = argparse.ArgumentParser()
    if (argv if argv is not None else sys.argv[1:])[:1] == ["--golden"]:
        raise SystemExit(golden_check())
    parser.add_argument("--checkpoint_dir", required=True)
    parser.add_argument("--tiles", required=True)
    parser.add_argument("--reference_outputs", default=None)
    parser.add_argument("--encoder_ckpt", default=None,
                        help="foundation-model safetensors for stripped "
                             "checkpoints (both sides load it)")
    parser.add_argument("--out", default=None)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--max_tiles", type=int, default=None)
    parser.add_argument("--tolerance", type=float, default=0.995,
                        help="min per-marker Pearson for PASS (0.5%% budget)")
    args = parser.parse_args(argv)

    from mipheivit_tpu.config import load_yaml
    from mipheivit_tpu.data.stats import (
        Normalizer, get_effective_width_height, get_input_mean_std,
        load_channel_stats)

    ckpt_dir = Path(args.checkpoint_dir)
    cfg = load_yaml(str(ckpt_dir / "config.yaml"))
    stats_path = ckpt_dir / "channel_stats.json"
    if not stats_path.exists():
        stats_path = Path(cfg.data.channel_stats_path)
    channel_stats = load_channel_stats(str(stats_path))
    markers = list(cfg.data.targ_channel_names)
    nc_out = len(markers)

    tiles = list_tiles(args.tiles)
    if args.max_tiles:
        tiles = tiles[:args.max_tiles]
    if not tiles:
        raise FileNotFoundError(f"no tiles found in {args.tiles}")
    sample = load_tile(tiles[0])
    width, _ = get_effective_width_height(sample.shape[1], sample.shape[0],
                                          train=True)

    rgb_stats = get_input_mean_std(
        cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
        channel_stats.rgb)
    he_norm = Normalizer(rgb_stats, mode="he")

    fwd = build_ours(cfg, width, nc_out, str(ckpt_dir))
    oracle = None
    if args.reference_outputs is None:
        oracle = build_torch_oracle(cfg, width, nc_out, str(ckpt_dir),
                                    args.encoder_ckpt)

    psum = np.zeros(nc_out)
    rsum = np.zeros(nc_out)
    psq = np.zeros(nc_out)
    rsq = np.zeros(nc_out)
    cross = np.zeros(nc_out)
    count = 0
    ssim_sum = np.zeros(nc_out)
    ssim_n = 0

    from mipheivit_tpu.metrics.pixel import ssim_per_image

    bs = args.batch_size
    for start in range(0, len(tiles), bs):
        batch_paths = tiles[start:start + bs]
        raw = np.stack([_center_crop(load_tile(p), width)
                        for p in batch_paths])
        x = he_norm(raw.astype(np.float32))
        pred = np.asarray(fwd(x), np.float32)          # [-0.9, 0.9] NHWC

        if oracle is not None:
            import torch

            with torch.no_grad():
                ref = oracle(torch.from_numpy(
                    np.moveaxis(x, -1, 1).astype(np.float32)))
            ref = np.moveaxis(ref.numpy(), 1, -1)
        else:
            refs = []
            for p in batch_paths:
                rp = _find_ref_output(Path(args.reference_outputs), Path(p))
                arr = load_tile(str(rp)).astype(np.float32)
                refs.append(arr / 255.0 * 1.8 - 0.9)
            ref = np.stack(refs)
            # uint8 quantization on our side too, apples-to-apples
            pred = (np.clip((pred + 0.9) / 1.8, 0, 1) * 255).astype(np.uint8)
            pred = pred.astype(np.float32) / 255.0 * 1.8 - 0.9

        pf = pred.reshape(-1, nc_out).astype(np.float64)
        rf = ref.reshape(-1, nc_out).astype(np.float64)
        psum += pf.sum(0)
        rsum += rf.sum(0)
        psq += (pf ** 2).sum(0)
        rsq += (rf ** 2).sum(0)
        cross += (pf * rf).sum(0)
        count += pf.shape[0]
        s = np.asarray(ssim_per_image(pred, ref))       # [B, C]
        ssim_sum += s.sum(0)
        ssim_n += s.shape[0]
        print(f"  {min(start + bs, len(tiles))}/{len(tiles)} tiles",
              flush=True)

    r = pearson_per_marker(psum, rsum, psq, rsq, cross, count)
    ssim = ssim_sum / max(ssim_n, 1)
    rows = [{"marker": m, "pearson_r": r[i], "ssim": ssim[i]}
            for i, m in enumerate(markers)]
    rows.append({"marker": "mean", "pearson_r": float(np.mean(r)),
                 "ssim": float(np.mean(ssim))})
    df = pd.DataFrame(rows)
    out = args.out or str(ckpt_dir / "parity_vs_reference.csv")
    df.to_csv(out, index=False)
    print(df.to_string(index=False))
    ok = bool(np.min(r) >= args.tolerance)
    print(f"{'PASS' if ok else 'FAIL'}: min per-marker Pearson "
          f"{float(np.min(r)):.5f} (budget >= {args.tolerance})")
    sys.exit(0 if ok else 1)


def _center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[top:top + size, left:left + size]


def _find_ref_output(ref_dir: Path, tile_path: Path) -> Path:
    for ext in TILE_EXTS:
        cand = ref_dir / (tile_path.stem + ext)
        if cand.exists():
            return cand
    raise FileNotFoundError(
        f"no reference output for {tile_path.stem} in {ref_dir}")


if __name__ == "__main__":
    main()
