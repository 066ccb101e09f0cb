"""ORION evaluation of HEMIT-codebase checkpoints.

Reference: evaluation/eval_orion_hemit_pipeline.py — same cell-level
pipeline as eval_orion, but the generator is a dual-branch
ResnetGeneratorSwinT loaded from a pix2pix-style checkpoint
(``latest_net_G.pth``), with the timm-Swin key surgery (old-timm downsample
shift, rel-pos/patch-embed resample) applied on import.
"""

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))

from common import (  # noqa: E402
    load_eval_config,
    results_dataframe,
    run_cell_accumulation,
    train_xgboost_or_none,
)
from mipheivit_tpu.data.stats import get_effective_width_height  # noqa: E402
from mipheivit_tpu.models.hemit import build_hemit  # noqa: E402
from mipheivit_tpu.models.import_hemit import hemit_swint_from_torch  # noqa: E402
from mipheivit_tpu.models.import_weights import load_state_dict  # noqa: E402
from mipheivit_tpu.slideio import read_image  # noqa: E402

DATASET_CONFIG_PATH = str(Path(__file__).parent.parent
                          / "mipheivit_tpu/configs/data/orion.yaml")


def build_hemit_forward(checkpoint_dir: str, width: int, nc_out: int,
                        old_timm_layout: bool = True,
                        netG: str = "SwinTResnet"):
    """Load any HEMIT-codebase generator (reference netG dispatch:
    src/generators/hemit_models.py:16-110 via get_generator_hemit)."""
    import jax

    from mipheivit_tpu.models.hemit import build_hemit_netG
    from mipheivit_tpu.models.import_hemit import (
        hybrid_swint_from_torch, hybrid_swint2_from_torch,
        swin_unet_from_torch)

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    ckpt = None
    for name in ("latest_net_G.pth", "model.pth", "net_G.pth"):
        cand = Path(checkpoint_dir) / name
        if cand.exists():
            ckpt = str(cand)
            break
    if ckpt is None:
        raise FileNotFoundError(
            f"no HEMIT generator checkpoint in {checkpoint_dir}")
    state = load_state_dict(ckpt)
    if netG == "SwinTResnet":
        model = build_hemit(width, 3, nc_out, dtype=dtype)
        params, stats = hemit_swint_from_torch(
            state, model, old_timm_layout=old_timm_layout)
    else:
        model = build_hemit_netG(netG, width, 3, nc_out, dtype=dtype)
        importer = {"swinT": hybrid_swint_from_torch,
                    "swinT_old": hybrid_swint2_from_torch,
                    "SwinTUnet": swin_unet_from_torch}.get(netG)
        if importer is None:
            raise NotImplementedError(
                f"no checkpoint importer for netG={netG!r}")
        params, stats = importer(state, model, (width, width))
    variables = {"params": params, "batch_stats": stats}
    # HEMIT generators emit tanh [-1, 1]; CellMetrics expects the IF codec
    # range [-0.9, 0.9]. The reference rescales (out+1)/2*1.8-0.9 == 0.9*out
    # before every update (eval_orion_hemit_pipeline.py:187-191,
    # eval_immucan_hemit_pipeline.py:164-167).
    return jax.jit(lambda x: model.apply(variables, x, train=False) * 0.9)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", type=str, required=True)
    parser.add_argument("--dataset_config_path", default=DATASET_CONFIG_PATH)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--netG", default="SwinTResnet",
                        help="HEMIT generator variant (reference "
                             "get_generator_hemit netG names)")
    parser.add_argument("--new_timm_layout", action="store_true",
                        help="skip the old-timm downsample key shift")
    args = parser.parse_args()

    cfg = load_eval_config(args.checkpoint_dir, args.dataset_config_path)
    slide_df = pd.read_csv(cfg.data.slide_dataframe_path)
    val_df = pd.read_csv(cfg.data.val_dataframe_path)
    test_df = pd.read_csv(cfg.data.test_dataframe_path)
    dataframe = pd.concat((val_df, test_df))
    dataframe["target_path"] = dataframe["image_path"]

    sample = read_image(dataframe["image_path"].iloc[0])
    width, height = get_effective_width_height(
        sample.shape[1], sample.shape[0], train=True)
    nc_out = len(cfg.data.targ_channel_names)
    fwd = build_hemit_forward(args.checkpoint_dir, width, nc_out,
                              old_timm_layout=not args.new_timm_layout,
                              netG=args.netG)

    cell_metrics = run_cell_accumulation(
        cfg, fwd, dataframe, slide_df, crop=min(256, width),
        batch_size=args.batch_size)
    cell_dataframe = cell_metrics.get_dataframe_cell_pred_target()
    cell_metrics.reset()

    val_slides = list(val_df["in_slide_name"].unique())
    test_slides = list(test_df["in_slide_name"].unique())
    val_cells = cell_dataframe[cell_dataframe["slide_name"].isin(val_slides)]
    test_cells = cell_dataframe[cell_dataframe["slide_name"].isin(test_slides)]

    results, logreg = cell_metrics.train_logistic_regression(
        val_cells, test_cells, return_metrics=True)
    out_dir = Path(args.checkpoint_dir)
    results_dataframe(results).to_csv(out_dir / "results_logreg.csv",
                                      index=False)
    cell_dataframe.to_csv(out_dir / "cell_dataframe.csv", index=False)
    np.savez(out_dir / "logreg.npz", **logreg.state_dict())
    _, xgb = train_xgboost_or_none(val_cells, test_cells, cell_metrics)
    if xgb is not None:
        xgb.to_csv(out_dir / "results_xgboost.csv", index=False)
    print(results_dataframe(results).to_string(index=False))


if __name__ == "__main__":
    main()
