"""scripts/parity_vs_reference.py on a tiny synthetic checkpoint.

Exercises both comparison modes end-to-end: the in-process torch oracle
(built from the same safetensors) and a precomputed reference-outputs dir.
With both sides computing from identical weights the per-marker Pearson
must clear the 0.5% budget (reference claim: BASELINE.json / README.md:66-93).
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.config import compose, save_config
from mipheivit_tpu.models import MipheiViT
from mipheivit_tpu.train.checkpoints import (
    mipheivit_state_dict, save_safetensors)

from test_checkpoints_infer import _tiny_cfg


def _load_harness():
    path = Path(__file__).parent.parent / "scripts/parity_vs_reference.py"
    spec = importlib.util.spec_from_file_location("parity_harness", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def parity_setup(tmp_path, rng, monkeypatch):
    import cv2

    cfg = compose(["+default_configs=miphei-vit"])
    vit_cfg = _tiny_cfg(lora=8)
    model = MipheiViT(vit_cfg=vit_cfg, out_chans=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_safetensors(
        mipheivit_state_dict(params, stats, vit_cfg, out_chans=3),
        str(ckpt_dir / "model.safetensors"))

    tiles_dir = tmp_path / "tiles"
    tiles_dir.mkdir()
    for i in range(4):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        cv2.imwrite(str(tiles_dir / f"t{i}.png"), img)

    stats_json = {
        "RGB": {"mean": [180.0, 140.0, 170.0], "std": [40.0, 45.0, 35.0]},
        "CD31": {"idx_channel": 0, "std": 10.0, "min": 0, "is_structural": True},
        "CD3e": {"idx_channel": 1, "std": 11.0, "min": 0, "is_structural": False},
        "Ki67": {"idx_channel": 2, "std": 12.0, "min": 0, "is_structural": False},
    }
    (ckpt_dir / "channel_stats.json").write_text(json.dumps(stats_json))
    cfg.data.channel_stats_path = str(ckpt_dir / "channel_stats.json")
    cfg.data.targ_channel_names = ["CD31", "CD3e", "Ki67"]
    save_config(cfg, ckpt_dir / "config.yaml")

    # route both sides to the tiny dims
    import mipheivit_tpu.infer.loading as loading
    import mipheivit_tpu.models.foundation as foundation

    monkeypatch.setattr(
        loading, "build_generator",
        lambda cfg, img_size, nc_out, dtype="float32":
        MipheiViT(vit_cfg=vit_cfg, out_chans=nc_out))

    tiny_spec = foundation.EncoderSpec(name="tiny", family="vit",
                                       vit_cfg=vit_cfg)
    monkeypatch.setattr(foundation, "get_encoder_spec",
                        lambda name, img_size: tiny_spec)
    return str(ckpt_dir), str(tiles_dir), tmp_path


def test_parity_oracle_mode(parity_setup):
    ckpt_dir, tiles_dir, tmp_path = parity_setup
    harness = _load_harness()
    out_csv = str(tmp_path / "parity.csv")
    with pytest.raises(SystemExit) as exc:
        harness.main(["--checkpoint_dir", ckpt_dir, "--tiles", tiles_dir,
                      "--out", out_csv, "--batch_size", "2"])
    assert exc.value.code == 0
    df = pd.read_csv(out_csv)
    assert list(df["marker"]) == ["CD31", "CD3e", "Ki67", "mean"]
    assert (df["pearson_r"] > 0.995).all()


def test_parity_reference_outputs_mode(parity_setup):
    ckpt_dir, tiles_dir, tmp_path = parity_setup
    harness = _load_harness()

    # generate the "reference outputs" with our own pipeline (uint8 codec),
    # so the comparison is exact up to quantization
    from mipheivit_tpu.config import load_yaml
    from mipheivit_tpu.data.stats import (
        Normalizer, get_input_mean_std, load_channel_stats)
    from mipheivit_tpu.infer.tiles import (
        predictions_to_uint8, save_prediction_tiff)

    cfg = load_yaml(str(Path(ckpt_dir) / "config.yaml"))
    channel_stats = load_channel_stats(str(Path(ckpt_dir) /
                                           "channel_stats.json"))
    he_norm = Normalizer(get_input_mean_std(
        cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
        channel_stats.rgb), mode="he")
    fwd = harness.build_ours(cfg, 32, 3, ckpt_dir)

    ref_dir = tmp_path / "ref_outputs"
    ref_dir.mkdir()
    for p in sorted(Path(tiles_dir).iterdir()):
        raw = harness.load_tile(str(p)).astype(np.float32)[None]
        pred = np.asarray(fwd(he_norm(raw)), np.float32)[0]
        save_prediction_tiff(predictions_to_uint8(pred),
                             str(ref_dir / f"{p.stem}.tiff"))

    out_csv = str(tmp_path / "parity_ref.csv")
    with pytest.raises(SystemExit) as exc:
        harness.main(["--checkpoint_dir", ckpt_dir, "--tiles", tiles_dir,
                      "--reference_outputs", str(ref_dir),
                      "--out", out_csv, "--batch_size", "2"])
    assert exc.value.code == 0
    df = pd.read_csv(out_csv)
    assert (df["pearson_r"] > 0.999).all()
