"""Utility-script ports (reference scripts/*.py + hemit/correct_names.py)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
sys.path.insert(0, str(Path(__file__).parent.parent / "hemit"))


def test_extract_std_channel_moments(tmp_path, rng):
    """Streaming per-channel moments equal the direct numpy computation
    (reference scripts/extract_std.py:29-55 accumulator)."""
    import cv2

    from extract_std import channel_moments

    tiles = []
    paths = []
    for i in range(3):
        t = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        p = tmp_path / f"t{i}.png"
        cv2.imwrite(str(p), cv2.cvtColor(t, cv2.COLOR_RGB2BGR))
        tiles.append(t)
        paths.append(str(p))
    stats = channel_moments(paths)
    stacked = np.concatenate([t.reshape(-1, 3) for t in tiles]).astype(
        np.float64)
    np.testing.assert_allclose(stats["mean"], stacked.mean(0), atol=1e-6)
    np.testing.assert_allclose(stats["std_channels"], stacked.std(0),
                               atol=1e-6)


def test_update_dataframe_split(tmp_path):
    from update_dataframe import build_slide_dataframe, split_dataframe

    for name in ("s1", "s2", "s3"):
        d = tmp_path / name
        d.mkdir()
        (d / f"{name}-registered.ome.tif").touch()
        (d / f"{name}-zlib.ome.tiff").touch()
    (tmp_path / "empty").mkdir()
    slide_df = build_slide_dataframe(str(tmp_path))
    assert len(slide_df) == 3
    assert slide_df["in_slide_name"].tolist() == [
        "s1-registered.ome", "s2-registered.ome", "s3-registered.ome"]

    df = pd.DataFrame({"in_slide_name": ["a", "b", "c", "d"],
                       "x": range(4)})
    train, val, test = split_dataframe(df, ["b"], ["d"])
    assert train["in_slide_name"].tolist() == ["a", "c"]
    assert val["in_slide_name"].tolist() == ["b"]
    assert test["in_slide_name"].tolist() == ["d"]


def test_update_dataframe2_repoint_and_rename(tmp_path):
    from update_dataframe2 import rename_pred_to_pos, repoint

    slide_df = pd.DataFrame({
        "targ_slide_path": ["/old/a.tiff", "/old/b.tiff"],
        "nuclei_csv_path": ["/old/a.csv", "/old/b.csv"]})
    out = repoint(slide_df, "/new_if", "/new_csv")
    assert out["targ_slide_path"].tolist() == ["/new_if/a.tiff",
                                               "/new_if/b.tiff"]
    assert out["nuclei_csv_path"].tolist() == ["/new_csv/a.csv",
                                               "/new_csv/b.csv"]
    df = pd.DataFrame({"CD31_pred": [1], "CD31_count": [2], "x": [3]})
    out = rename_pred_to_pos(df)
    assert set(out.columns) == {"CD31_pos", "CD31_count", "x"}


def test_correct_names_renames_b_side(tmp_path):
    from correct_names import correct_split

    root = tmp_path / "ds"
    (root / "trainA").mkdir(parents=True)
    (root / "trainB").mkdir()
    rows = []
    for i in range(3):
        a = root / "trainA" / f"tile_{i}.png"
        a.touch()
        b = root / "trainB" / f"mif_{i}.tiff"
        b.write_text("x")
        rows.append({"image_path": str(a), "target_path": str(b)})
    df = pd.DataFrame(rows)
    n = correct_split(df, root / "trainB")
    assert n == 3
    for i in range(3):
        assert (root / "trainB" / f"tile_{i}.tiff").exists()
        assert not (root / "trainB" / f"mif_{i}.tiff").exists()
    # idempotent second run
    assert correct_split(df, root / "trainB") == 0


def test_inference_hemit_end_to_end(tmp_path, rng, monkeypatch):
    """scripts/inference_hemit.py: tiny convnext UnetMultiHeads checkpoint
    over the HEMIT folder layout -> real_A/fake_B/real_B triplets
    (reference scripts/inference_hemit.py:73-91)."""
    import cv2

    import jax
    import jax.numpy as jnp

    import inference_hemit
    from test_smp_import import DEPTHS, DIMS, _emit_smp_state
    from mipheivit_tpu.models.smp_unet import UnetMultiHeads
    from mipheivit_tpu.train.checkpoints import save_safetensors

    tiny_kw = dict(decoder_channels=(16, 8, 8, 8, 8),
                   encoder_dims=DIMS, encoder_depths=DEPTHS)

    def tiny_unet(**kw):
        return UnetMultiHeads(**{**kw, **tiny_kw})

    monkeypatch.setattr(inference_hemit, "UnetMultiHeads", tiny_unet)

    model = tiny_unet(encoder_name="convnext", out_chans=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    sd = _emit_smp_state(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]), out_chans=1)
    sd = {f"generator.{k}": v for k, v in sd.items()}
    ckpt = tmp_path / "model.safetensors"
    save_safetensors(sd, str(ckpt))

    ds = tmp_path / "ds"
    for sub in ("input", "label"):
        (ds / "test" / sub).mkdir(parents=True)
    for i in range(3):
        he = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        mif = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(ds / "test" / "input" / f"t{i}.png"),
                    cv2.cvtColor(he, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(ds / "test" / "label" / f"t{i}.png"),
                    cv2.cvtColor(mif, cv2.COLOR_RGB2BGR))

    out_dir = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "inference_hemit.py", "--dataset_dir", str(ds),
        "--checkpoint_path", str(ckpt), "--output_dir", str(out_dir),
        "--batch_size", "2"])
    inference_hemit.main()
    for i in range(3):
        for kind in ("real_A", "fake_B", "real_B"):
            assert (out_dir / "images" / f"{i}_{kind}.png").exists()
    fake = cv2.imread(str(out_dir / "images" / "0_fake_B.png"),
                      cv2.IMREAD_UNCHANGED)
    assert fake.shape == (64, 64)
