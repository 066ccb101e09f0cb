"""HEMIT reproduction trainer end-to-end (tiny dual-branch model)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "hemit"))


def test_train_hemit_end_to_end(tmp_path, rng, monkeypatch):
    import cv2

    import train_hemit
    from mipheivit_tpu.models.hemit import ResnetGeneratorSwinT
    from mipheivit_tpu.models.swin import SwinConfig

    for split in ("train", "val"):
        for sub in ("input", "label"):
            (tmp_path / "data" / split / sub).mkdir(parents=True)
        for i in range(4):
            cv2.imwrite(str(tmp_path / "data" / split / "input" / f"t{i}.png"),
                        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
            cv2.imwrite(str(tmp_path / "data" / split / "label" / f"t{i}.png"),
                        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    tiny_swin = SwinConfig(img_size=(64, 64), patch_size=4, embed_dim=16,
                           depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                           window_size=4)
    monkeypatch.setattr(
        train_hemit, "build_hemit",
        lambda img, ci, co, dtype="float32": ResnetGeneratorSwinT(
            out_channels=co, ngf=8, n_blocks=1, swin_cfg=tiny_swin, top_k=16))
    monkeypatch.setattr(sys, "argv", [
        "train_hemit.py", "--data_root", str(tmp_path / "data"),
        "--out_dir", str(tmp_path / "run"), "--epochs", "1",
        "--batch_size", "2", "--crop", "64", "--nc_out", "3"])
    train_hemit.main()
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    assert (tmp_path / "run" / "orbax").exists()
