"""Evaluation scripts end-to-end on synthetic tiles + tiny model."""

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent / "evaluation"))

from mipheivit_tpu.config import compose, save_config
from mipheivit_tpu.models import MipheiViT, ViTConfig
from mipheivit_tpu.train.checkpoints import (
    mipheivit_state_dict,
    save_safetensors,
)
from mipheivit_tpu.slideio import write_pyramid


@pytest.fixture
def eval_setup(tmp_path, rng, monkeypatch):
    """Checkpoint + ORION-like synthetic dataset where marker intensity
    correlates with ground-truth positivity."""
    import cv2

    markers = ["Hoechst", "CD31", "CD3e"]
    vit_cfg = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32,
                        depth=2, num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                        attn_impl="xla", remat=False, lora_rank=8)
    model = MipheiViT(vit_cfg=vit_cfg, out_chans=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    save_safetensors(mipheivit_state_dict(params, stats, vit_cfg, 3),
                     str(ckpt_dir / "model.safetensors"))

    tiles = tmp_path / "tiles"
    tiles.mkdir()
    rows = {"val": [], "test": []}
    cells = {"sval": [], "stest": []}
    label = 1
    for split, slide in (("val", "sval"), ("test", "stest")):
        for i in range(4):
            he = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            nuc = np.zeros((1, 32, 32), np.int32)
            for j in range(2):
                nuc[0, 4 + 12 * j:14 + 12 * j, 4:30] = label
                cells[slide].append({"label": label,
                                     "CD31_pos": label % 2 == 0,
                                     "CD3e_pos": label % 3 == 0})
                label += 1
            img = str(tiles / f"{split}{i}.png")
            cv2.imwrite(img, cv2.cvtColor(he, cv2.COLOR_RGB2BGR))
            nucp = str(tiles / f"{split}{i}_nuc.tiff")
            write_pyramid(nucp, nuc, n_levels=1, tile_size=32)
            rows[split].append({"image_path": img, "nuclei_path": nucp,
                                "in_slide_name": slide})
    for split in ("val", "test"):
        pd.DataFrame(rows[split]).to_csv(tmp_path / f"{split}.csv", index=False)
    slide_rows = []
    for slide in ("sval", "stest"):
        path = tmp_path / f"{slide}_cells.csv"
        pd.DataFrame(cells[slide]).to_csv(path, index=False)
        slide_rows.append({"in_slide_name": slide,
                           "nuclei_csv_path": str(path)})
    pd.DataFrame(slide_rows).to_csv(tmp_path / "slides.csv", index=False)

    stats_json = {"RGB": {"mean": [180.0] * 3, "std": [40.0] * 3}}
    for i, name in enumerate(markers):
        stats_json[name] = {"idx_channel": i, "std": 10.0, "min": 0,
                            "is_structural": False}
    (tmp_path / "channel_stats.json").write_text(json.dumps(stats_json))

    cfg = compose(["+default_configs=miphei-vit"])
    cfg.data.slide_dataframe_path = str(tmp_path / "slides.csv")
    cfg.data.train_dataframe_path = str(tmp_path / "val.csv")
    cfg.data.val_dataframe_path = str(tmp_path / "val.csv")
    cfg.data.test_dataframe_path = str(tmp_path / "test.csv")
    cfg.data.channel_stats_path = str(tmp_path / "channel_stats.json")
    cfg.data.targ_channel_names = markers
    cfg.train.batch_size = 2
    save_config(cfg, ckpt_dir / "config.yaml")

    import mipheivit_tpu.infer.loading as loading

    def tiny_builder(cfg, img_size, nc_out, dtype="float32"):
        # honor the requested size (eval_hemit builds at half resolution;
        # pos-embed is resampled on import)
        size = tuple(img_size) if not isinstance(img_size, int) \
            else (img_size, img_size)
        return MipheiViT(vit_cfg=vit_cfg.replace(img_size=size),
                         out_chans=nc_out)

    monkeypatch.setattr(loading, "build_generator", tiny_builder)
    return str(ckpt_dir), tmp_path


def test_eval_orion_end_to_end(eval_setup, monkeypatch):
    ckpt_dir, tmp_path = eval_setup
    import eval_orion

    monkeypatch.setattr(sys, "argv",
                        ["eval_orion.py", "--checkpoint_dir", ckpt_dir,
                         "--dataset_config_path", "/nonexistent.yaml",
                         "--batch_size", "2"])
    eval_orion.main()
    out = Path(ckpt_dir)
    results = pd.read_csv(out / "results_logreg.csv")
    assert set(results["Marker"]) == {"CD31_pos", "CD3e_pos"}
    assert np.isfinite(results["ROC AUC"]).all()
    assert (out / "cell_dataframe.csv").exists()
    assert (out / "logreg.npz").exists()


def test_eval_immucan_end_to_end(eval_setup, monkeypatch):
    ckpt_dir, tmp_path = eval_setup
    import eval_immucan
    import eval_orion

    # immucan needs the logreg from eval_orion first
    monkeypatch.setattr(sys, "argv",
                        ["eval_orion.py", "--checkpoint_dir", ckpt_dir,
                         "--dataset_config_path", "/nonexistent.yaml",
                         "--batch_size", "2"])
    eval_orion.main()

    # immucan tile dataframe: counts columns per marker
    test_df = pd.read_csv(Path(tmp_path) / "test.csv")
    test_df["CD3e_count"] = np.arange(len(test_df))
    test_df["CD31_count"] = np.arange(len(test_df))[::-1]
    imm_csv = Path(tmp_path) / "immucan.csv"
    test_df.to_csv(imm_csv, index=False)
    from mipheivit_tpu.config import load_yaml, save_config as _save

    cfg = load_yaml(Path(ckpt_dir) / "config.yaml")
    cfg.data.test_dataframe_path = str(imm_csv)
    _save(cfg, Path(ckpt_dir) / "config.yaml")

    monkeypatch.setattr(sys, "argv",
                        ["eval_immucan.py", "--checkpoint_dir", ckpt_dir,
                         "--dataset_config_path", "/nonexistent.yaml",
                         "--batch_size", "2"])
    eval_immucan.main()
    assert (Path(ckpt_dir) / "immucan_corr.csv").exists()
    assert (Path(ckpt_dir) / "immucan_tile_sums.csv").exists()
    corr = pd.read_csv(Path(ckpt_dir) / "immucan_corr.csv")
    assert "CD3e" in set(corr["Marker"])


def test_eval_hemit_end_to_end(eval_setup, monkeypatch, tmp_path):
    """eval_hemit twin: 20x (0.5-scale) inference + train-cell-fit gating."""
    import eval_hemit

    ckpt_dir, base = eval_setup
    # hemit needs a train dataframe too; reuse val tiles as "train"
    from mipheivit_tpu.config import load_yaml, save_config

    cfg = load_yaml(Path(ckpt_dir) / "config.yaml")
    cfg.data.train_dataframe_path = cfg.data.val_dataframe_path
    save_config(cfg, Path(ckpt_dir) / "config.yaml")

    monkeypatch.setattr(sys, "argv",
                        ["eval_hemit.py", "--checkpoint_dir", ckpt_dir,
                         "--dataset_config_path", "/nonexistent.yaml",
                         "--batch_size", "2"])
    eval_hemit.main()
    out = Path(ckpt_dir)
    for split in ("val", "test"):
        res = pd.read_csv(out / f"hemit_results_logreg_{split}.csv")
        assert np.isfinite(res["ROC AUC"]).all()
    assert (out / "hemit_cell_dataframe.csv").exists()


def _tiny_hemit_forward_factory(nc_out_holder):
    """Stand-in for build_hemit_forward: tanh-range tiny conv generator,
    rescaled by 0.9 exactly like the real builder (reference
    eval_*_hemit_pipeline rescale, :187-191)."""
    import jax

    def build(checkpoint_dir, width, nc_out, old_timm_layout=True,
              netG="SwinTResnet"):
        nc_out_holder.append((netG, old_timm_layout))
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (1, 1, 3, nc_out)) * 0.1

        @jax.jit
        def fwd(x):
            out = jnp.tanh(jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
            return out * 0.9

        return fwd

    return build


def test_eval_orion_hemit_pipeline_end_to_end(eval_setup, monkeypatch):
    """HEMIT-codebase checkpoint twin of eval_orion: same cell pipeline,
    generator swapped (reference: evaluation/eval_orion_hemit_pipeline.py)."""
    ckpt_dir, tmp_path = eval_setup
    import eval_orion_hemit_pipeline as ehp

    calls = []
    monkeypatch.setattr(ehp, "build_hemit_forward",
                        _tiny_hemit_forward_factory(calls))
    monkeypatch.setattr(sys, "argv",
                        ["eval_orion_hemit_pipeline.py",
                         "--checkpoint_dir", ckpt_dir,
                         "--dataset_config_path", "/nonexistent.yaml",
                         "--batch_size", "2"])
    ehp.main()
    assert calls == [("SwinTResnet", True)]
    out = Path(ckpt_dir)
    results = pd.read_csv(out / "results_logreg.csv")
    assert set(results["Marker"]) == {"CD31_pos", "CD3e_pos"}
    assert np.isfinite(results["ROC AUC"]).all()
    assert (out / "logreg.npz").exists()


def test_eval_immucan_hemit_pipeline_end_to_end(eval_setup, monkeypatch):
    """IMMUCAN tile-Pearson over a HEMIT-pipeline checkpoint (reference:
    evaluation/eval_immucan_hemit_pipeline.py:98-195): needs the ORION
    logreg first, then emits immucan_corr.csv / immucan_tile_sums.csv."""
    ckpt_dir, tmp_path = eval_setup
    import eval_immucan_hemit_pipeline as eihp
    import eval_orion_hemit_pipeline as ehp

    calls = []
    monkeypatch.setattr(ehp, "build_hemit_forward",
                        _tiny_hemit_forward_factory(calls))
    monkeypatch.setattr(eihp, "build_hemit_forward",
                        _tiny_hemit_forward_factory(calls))
    # logreg gate comes from the checkpoint folder (reference :141-144)
    monkeypatch.setattr(sys, "argv",
                        ["eval_orion_hemit_pipeline.py",
                         "--checkpoint_dir", ckpt_dir,
                         "--dataset_config_path", "/nonexistent.yaml",
                         "--batch_size", "2"])
    ehp.main()

    test_df = pd.read_csv(Path(tmp_path) / "test.csv")
    test_df["CD3e_count"] = np.arange(len(test_df))
    test_df["CD31_count"] = np.arange(len(test_df))[::-1]
    imm_csv = Path(tmp_path) / "immucan.csv"
    test_df.to_csv(imm_csv, index=False)
    from mipheivit_tpu.config import load_yaml, save_config as _save

    cfg = load_yaml(Path(ckpt_dir) / "config.yaml")
    cfg.data.test_dataframe_path = str(imm_csv)
    _save(cfg, Path(ckpt_dir) / "config.yaml")

    monkeypatch.setattr(sys, "argv",
                        ["eval_immucan_hemit_pipeline.py",
                         "--checkpoint_dir", ckpt_dir,
                         "--dataset_config_path", "/nonexistent.yaml",
                         "--batch_size", "2"])
    eihp.main()
    assert (Path(ckpt_dir) / "immucan_corr.csv").exists()
    corr = pd.read_csv(Path(ckpt_dir) / "immucan_corr.csv")
    assert "CD3e" in set(corr["Marker"])
    sums = pd.read_csv(Path(ckpt_dir) / "immucan_tile_sums.csv")
    assert "CD3e_pos_logreg" in sums.columns


def test_marker_figures_script(tmp_path, rng):
    """figures/marker_figures.py: per-marker metrics + three PNG artifacts
    from a synthetic test_dataframe_cell.csv (reference L7 parity)."""
    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent / "figures"))
    from marker_figures import make_figures, per_marker_metrics

    n = 300
    df = pd.DataFrame({
        "cell_id": np.arange(n),
        "CD31_pos": rng.random(n) < 0.3,
        "CD3e_pos": rng.random(n) < 0.5,
    })
    # predictions correlated with GT -> AUC well above 0.5
    df["CD31_pred"] = df["CD31_pos"] * 2.0 + rng.standard_normal(n)
    df["CD3e_pred"] = df["CD3e_pos"] * 1.5 + rng.standard_normal(n)
    csv = tmp_path / "test_dataframe_cell.csv"
    df.to_csv(csv, index=False)

    metrics = per_marker_metrics(df)
    assert set(metrics["marker"]) == {"CD31", "CD3e"}
    assert (metrics["roc_auc"] > 0.7).all()

    make_figures(str(csv), str(tmp_path / "figs"))
    for name in ("marker_metrics.csv", "marker_auc.png",
                 "marker_violins.png", "marker_correlation.png"):
        assert (tmp_path / "figs" / name).exists()


def test_prediction_panels_render(tmp_path, rng):
    sys.path.insert(0, str(Path(__file__).parent.parent / "figures"))
    from prediction_panels import render_panel

    he = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    gt = rng.integers(0, 255, (32, 32, 2), dtype=np.uint8)
    pred = rng.integers(0, 255, (32, 32, 2), dtype=np.uint8)
    out = str(tmp_path / "panel.png")
    render_panel(he, gt, pred, ["CD31", "CD3e"], out)
    assert Path(out).exists()


def test_embedding_map_plot(tmp_path, rng):
    sys.path.insert(0, str(Path(__file__).parent.parent / "figures"))
    from datasets_umap import plot_embedding, reduce_2d

    embs = rng.standard_normal((60, 16)).astype(np.float32)
    coords = reduce_2d(embs, seed=0)
    assert coords.shape == (60, 2)
    out = str(tmp_path / "umap.png")
    plot_embedding(coords, ["train"] * 30 + ["val"] * 30, out)
    assert Path(out).exists()
