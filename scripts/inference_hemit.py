"""Batch inference of an SMP-style multi-head U-Net over the HEMIT
folder-layout test split, writing pix2pix-style triplet PNGs.

Reference: scripts/inference_hemit.py — UnetMultiHeads over
``<dataset_dir>/test``, per tile: ``<i>_real_A.png`` (un-normalized H&E),
``<i>_fake_B.png`` (prediction through the IF codec, uint8),
``<i>_real_B.png`` (target channel). The reference hardcodes a
mobilenet_v2 encoder; our CNN zoo imports the convnext trunk
(smp_unet_from_torch), and checkpoints load from a Lightning
``.ckpt``/safetensors state dict with the ``generator.`` prefix stripped
(reference extract_generator_state_dict, :28-34).
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

from mipheivit_tpu.data.stats import Normalizer  # noqa: E402
from mipheivit_tpu.models.smp_unet import UnetMultiHeads  # noqa: E402
from mipheivit_tpu.slideio import read_image  # noqa: E402


def dataframe_from_folders(root: str, split: str) -> pd.DataFrame:
    base = Path(root) / split
    rows = []
    for img in sorted((base / "input").glob("*")):
        label = base / "label" / img.name
        if label.exists():
            rows.append({"image_path": str(img), "target_path": str(label)})
    return pd.DataFrame(rows)


def load_variables(checkpoint_path: str):
    from mipheivit_tpu.models.import_weights import (
        load_state_dict, smp_unet_from_torch)

    state = load_state_dict(checkpoint_path)
    state = {k[len("generator."):]: v for k, v in state.items()
             if k.startswith("generator.")} or state
    params, stats = smp_unet_from_torch(state)
    return {"params": params, "batch_stats": stats}


def main():
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--channel_stats", default=None,
                        help="channel_stats.json for the H&E normalization")
    parser.add_argument("--encoder", default="convnext",
                        choices=("resnet50", "convnext"),
                        help="convnext is the importable trunk; resnet50 "
                             "only works with matching-layout checkpoints")
    parser.add_argument("--targ_channel_idxs", type=int, nargs="*",
                        default=[2])
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args()

    import cv2

    out_dir = Path(args.output_dir)
    image_dir = out_dir / "images"
    image_dir.mkdir(parents=True, exist_ok=True)

    rgb = {"mean": [127.5] * 3, "std": [127.5] * 3}
    if args.channel_stats:
        rgb = json.load(open(args.channel_stats))["RGB"]
    norm = Normalizer(rgb, mode="he")

    df = dataframe_from_folders(args.dataset_dir, "test")
    if df.empty:
        raise SystemExit(f"no test pairs under {args.dataset_dir}/test")
    sample = read_image(df["image_path"].iloc[0])
    h, w = sample.shape[:2]

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    model = UnetMultiHeads(encoder_name=args.encoder, out_chans=1,
                           dropout=0.0, dtype=dtype)
    variables = load_variables(args.checkpoint_path)
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))

    idx_image = 0
    for start in range(0, len(df), args.batch_size):
        chunk = df.iloc[start:start + args.batch_size]
        imgs = np.stack([read_image(p) for p in chunk["image_path"]])
        targs = [read_image(p) for p in chunk["target_path"]]
        x = norm(imgs.astype(np.float32))
        out = np.asarray(fwd(x))
        # IF codec decode [-0.9, 0.9] -> uint8 (reference :78)
        out = np.clip((out + 0.9) * 255.0 / 1.8, 0.0, 255.0).astype(np.uint8)
        real_a = np.clip(norm.unormalize(x), 0, 255).astype(np.uint8)
        for k in range(len(chunk)):
            t = targs[k]
            if t.ndim == 3:
                t = t[..., args.targ_channel_idxs]
            cv2.imwrite(str(image_dir / f"{idx_image}_real_A.png"),
                        real_a[k][..., ::-1])
            cv2.imwrite(str(image_dir / f"{idx_image}_fake_B.png"),
                        out[k, ..., 0])
            cv2.imwrite(str(image_dir / f"{idx_image}_real_B.png"),
                        t[..., 0] if t.ndim == 3 else t)
            idx_image += 1
    print(f"{idx_image} tiles -> {image_dir}")


if __name__ == "__main__":
    main()
