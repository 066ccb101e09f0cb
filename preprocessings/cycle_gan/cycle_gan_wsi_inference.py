"""WSI-scale CycleGAN stain normalization.

Reference: preprocessings/cycle_gan/cycle_gan_wsi_inference.py — run the
normalizer over a whole slide tile-by-tile and write the normalized replica
as a tiled pyramidal TIFF (consumed by SlideAugentationCallback swaps).
Overlap-free tiling matches the reference (generator is ~shift-equivariant
away from borders; the swap augmentation tolerates seam pixels).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from resnet_generator import ResnetGenerator, params_from_torch  # noqa: E402
from mipheivit_tpu.models.import_weights import load_state_dict  # noqa: E402
from mipheivit_tpu.slideio import SlideReader, write_pyramid  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_path", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--tile_size", type=int, default=512)
    parser.add_argument("--batch_size", type=int, default=4)
    args = parser.parse_args()

    model = ResnetGenerator()
    params = params_from_torch(load_state_dict(args.checkpoint))
    fwd = jax.jit(lambda x: model.apply({"params": params}, x))

    reader = SlideReader(args.slide_path, mode="RGB")
    w, h = reader.dimensions
    out = np.zeros((3, h, w), np.uint8)
    tiles, coords = [], []

    def flush():
        nonlocal tiles, coords
        if not tiles:
            return
        n = len(tiles)
        x = np.stack(tiles)
        if n < args.batch_size:
            x = np.concatenate([x, np.zeros(
                (args.batch_size - n,) + x.shape[1:], x.dtype)])
        pred = np.asarray(fwd(jnp.asarray(x, jnp.float32) / 127.5 - 1.0))[:n]
        pred = ((pred + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        for img, (tx, ty) in zip(pred, coords):
            cw = min(args.tile_size, w - tx)
            ch = min(args.tile_size, h - ty)
            out[:, ty:ty + ch, tx:tx + cw] = img[:ch, :cw].transpose(2, 0, 1)
        tiles, coords = [], []

    for ty in range(0, h, args.tile_size):
        for tx in range(0, w, args.tile_size):
            tiles.append(reader.read_region((tx, ty), 0,
                                            (args.tile_size, args.tile_size)))
            coords.append((tx, ty))
            if len(tiles) == args.batch_size:
                flush()
    flush()
    write_pyramid(args.out_path, out, n_levels=4, tile_size=512,
                  mpp=reader.mpp or 0.0)
    reader.close()
    print(f"normalized WSI -> {args.out_path}")


if __name__ == "__main__":
    main()
