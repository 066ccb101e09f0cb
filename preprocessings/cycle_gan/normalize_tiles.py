"""Stain-normalize tiles with a CycleGAN checkpoint.

Reference: preprocessings/cycle_gan/ inference scripts — run the vendored
ResnetGenerator over H&E tiles (or WSI windows) to produce the normalized
replicas consumed by the augmentation-swap callbacks. Output files keep the
source tile's name so ``swap_augmentation_replicas`` finds them.
"""

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from resnet_generator import ResnetGenerator, params_from_torch  # noqa: E402
from mipheivit_tpu.models.import_weights import load_state_dict  # noqa: E402
from mipheivit_tpu.slideio import read_image  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--tile_dataframe", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="CycleGAN generator .pth")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=8)
    args = parser.parse_args()

    model = ResnetGenerator()
    params = params_from_torch(load_state_dict(args.checkpoint))
    fwd = jax.jit(lambda x: model.apply({"params": params}, x))

    df = pd.read_csv(args.tile_dataframe)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    batch, names = [], []

    def flush():
        nonlocal batch, names
        if not batch:
            return
        x = jnp.asarray(np.stack(batch), jnp.float32) / 127.5 - 1.0
        out = np.asarray(fwd(x))
        out = ((out + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        for img, name in zip(out, names):
            cv2.imwrite(str(out_dir / name),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        batch, names = [], []

    for _, row in df.iterrows():
        batch.append(read_image(row["image_path"]))
        names.append(Path(row["image_path"]).name)
        if len(batch) == args.batch_size:
            flush()
    flush()
    print(f"normalized {len(df)} tiles -> {out_dir}")


if __name__ == "__main__":
    main()
