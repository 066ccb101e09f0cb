"""Checkpoint exchange roundtrip + inference driver end-to-end."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.config import compose, save_config
from mipheivit_tpu.models import MipheiViT, ViTConfig
from mipheivit_tpu.models.import_weights import mipheivit_from_torch
from mipheivit_tpu.train.checkpoints import (
    latest_checkpoint,
    mipheivit_state_dict,
    restore_train_state,
    save_safetensors,
    save_train_state,
)
from mipheivit_tpu.slideio import TiffSlide, write_pyramid


def _tiny_cfg(lora=2):
    return ViTConfig(
        img_size=(32, 32), patch_size=4, embed_dim=32, depth=2, num_heads=2,
        mlp_hidden_dim=64, reg_tokens=4, no_embed_class=True,
        attn_impl="xla", remat=False, lora_rank=lora)


def test_state_dict_roundtrip(rng):
    """export -> import reproduces params bit-exactly (full + FM-stripped)."""
    cfg = _tiny_cfg()
    model = MipheiViT(vit_cfg=cfg, out_chans=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    # full export
    sd = mipheivit_state_dict(params, stats, cfg, out_chans=3)
    p2, s2 = mipheivit_from_torch(sd, cfg, out_chans=3)
    jax.tree.map(np.testing.assert_array_equal, params, p2)
    jax.tree.map(np.testing.assert_array_equal, stats, s2)

    # FM-stripped export + separate encoder checkpoint
    stripped = mipheivit_state_dict(params, stats, cfg, out_chans=3,
                                    strip_foundation=True)
    assert not any(k.startswith("encoder.vit.patch_embed") for k in stripped)
    assert any(".lora_q.A" in k for k in stripped)
    from mipheivit_tpu.train.checkpoints import vit_state_dict

    enc_sd = vit_state_dict(params["encoder"]["vit"],
                            cfg.replace(lora_rank=0), "")
    p3, s3 = mipheivit_from_torch(stripped, cfg, out_chans=3,
                                  encoder_state=enc_sd)
    jax.tree.map(np.testing.assert_array_equal, params, p3)


def test_safetensors_roundtrip(tmp_path, rng):
    cfg = _tiny_cfg()
    model = MipheiViT(vit_cfg=cfg, out_chans=2)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    sd = mipheivit_state_dict(params, stats, cfg, out_chans=2)
    path = tmp_path / "model.safetensors"
    save_safetensors(sd, str(path))

    from mipheivit_tpu.models.import_weights import load_state_dict

    loaded = load_state_dict(str(path))
    p2, _ = mipheivit_from_torch(loaded, cfg, out_chans=2)
    jax.tree.map(np.testing.assert_array_equal, params, p2)


def test_orbax_train_state_roundtrip(tmp_path, rng):
    from mipheivit_tpu.metrics import PixelMetrics
    from mipheivit_tpu.train.losses import weighted_mse_loss
    from mipheivit_tpu.train.optim import build_generator_optimizer
    from mipheivit_tpu.train.steps import create_train_state, make_train_step

    cfg = _tiny_cfg()
    model = MipheiViT(vit_cfg=cfg, out_chans=2)
    batch = {
        "image": rng.standard_normal((2, 32, 32, 3)).astype(np.float32),
        "target": rng.uniform(-0.9, 0.9, (2, 32, 32, 2)).astype(np.float32),
    }
    opt = build_generator_optimizer("myvitmatte", 1e-3, 10)
    state = create_train_state(jax.random.PRNGKey(0), model, opt,
                               sample_batch=batch)
    step = jax.jit(make_train_step(
        model, weighted_mse_loss(50.0, np.ones(2, np.float32)), opt))
    state, _, _ = step(state, batch, PixelMetrics.zeros())

    path = save_train_state(state, str(tmp_path / "ckpts"))
    assert latest_checkpoint(str(tmp_path / "ckpts")) == path
    abstract = jax.tree.map(np.asarray, state)
    restored = restore_train_state(path, abstract)
    assert int(restored.step) == 1
    jax.tree.map(np.testing.assert_array_equal,
                 jax.tree.map(np.asarray, state.gen_params),
                 restored.gen_params)


@pytest.fixture
def inference_setup(tmp_path, rng):
    """Checkpoint dir (config.yaml + model.safetensors) + tile dataframe."""
    import cv2

    cfg = compose(["+default_configs=miphei-vit"])
    # shrink the encoder for test speed by monkeypatching get_generator via
    # config: use the tiny model through the myvitmatte path is not possible,
    # so instead we build the tiny model directly and save in reference format.
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
    rows = []
    for i in range(5):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        path = str(tiles_dir / f"t{i}.png")
        cv2.imwrite(path, img)
        rows.append({"image_path": path})
    df = pd.DataFrame(rows)
    df_path = tmp_path / "test.csv"
    df.to_csv(df_path, index=False)

    stats_json = {
        "RGB": {"mean": [180.0, 140.0, 170.0], "std": [40.0, 45.0, 35.0]},
        "CD31": {"idx_channel": 0, "std": 10.0, "min": 0, "is_structural": True},
        "CD3e": {"idx_channel": 1, "std": 11.0, "min": 0, "is_structural": False},
        "Ki67": {"idx_channel": 2, "std": 12.0, "min": 0, "is_structural": False},
    }
    stats_path = tmp_path / "channel_stats.json"
    stats_path.write_text(json.dumps(stats_json))

    cfg.data.test_dataframe_path = str(df_path)
    cfg.data.channel_stats_path = str(stats_path)
    cfg.data.targ_channel_names = ["CD31", "CD3e", "Ki67"]
    cfg.train.batch_size = 2
    save_config(cfg, ckpt_dir / "config.yaml")
    return cfg, str(ckpt_dir), vit_cfg, (model, variables)


def test_inference_model_writes_tiles(inference_setup, tmp_path, monkeypatch):
    cfg, ckpt_dir, vit_cfg, _ = inference_setup
    # route generator construction to the tiny config
    import mipheivit_tpu.infer.loading as loading

    monkeypatch.setattr(
        loading, "build_generator",
        lambda cfg, img_size, nc_out, dtype="float32":
        MipheiViT(vit_cfg=vit_cfg, out_chans=nc_out))

    from mipheivit_tpu.infer import inference_model

    out_dir = inference_model(cfg, ckpt_dir, str(tmp_path / "preds"))
    outs = sorted(Path(out_dir).glob("*.tiff"))
    assert len(outs) == 5
    ts = TiffSlide(str(outs[0]))
    assert ts.n_channels == 3
    arr = ts.read_region((0, 0), 0, (32, 32))
    assert arr.dtype == np.uint8
    ts.close()


def test_wsi_inference_stitching(inference_setup, tmp_path):
    cfg, ckpt_dir, vit_cfg, (model, variables) = inference_setup
    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer import wsi_inference

    rng = np.random.default_rng(5)
    he = rng.integers(100, 255, (3, 96, 96), dtype=np.uint8)
    slide_path = str(tmp_path / "wsi.tiff")
    write_pyramid(slide_path, he, n_levels=2, tile_size=32)
    he_norm = Normalizer({"mean": [180.0] * 3, "std": [40.0] * 3}, "he")
    out = wsi_inference(
        model, variables, slide_path, str(tmp_path / "pred.ome.tiff"),
        ["CD31", "CD3e", "Ki67"], he_norm, tile_size=32, overlap=8,
        batch_size=2, tissue_only=False, n_pyramid_levels=2)
    ts = TiffSlide(out)
    assert ts.n_channels == 3
    assert ts.level_dimensions[0] == (96, 96)
    full = ts.read_region((0, 0), 0, (96, 96))
    assert full.dtype == np.uint8
    # stitched output has no zero seams: every pixel was covered
    assert (full.sum(axis=-1) > 0).mean() > 0.99
    ts.close()


def test_wsi_streaming_matches_inram(inference_setup, tmp_path):
    """RollingAccumulator + memmap output must equal the in-RAM path."""
    cfg, ckpt_dir, vit_cfg, (model, variables) = inference_setup
    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer import wsi_inference

    rng = np.random.default_rng(9)
    he = rng.integers(60, 255, (3, 160, 128), dtype=np.uint8)
    slide_path = str(tmp_path / "wsi2.tiff")
    write_pyramid(slide_path, he, n_levels=2, tile_size=32)
    norm = Normalizer({"mean": [180.0] * 3, "std": [40.0] * 3}, "he")
    kwargs = dict(tile_size=32, overlap=8, batch_size=2, tissue_only=False,
                  n_pyramid_levels=2)
    out_a = wsi_inference(model, variables, slide_path,
                          str(tmp_path / "a.ome.tiff"),
                          ["CD31", "CD3e", "Ki67"], norm, **kwargs)
    out_b = wsi_inference(model, variables, slide_path,
                          str(tmp_path / "b.ome.tiff"),
                          ["CD31", "CD3e", "Ki67"], norm,
                          memmap_path=str(tmp_path / "spill.raw"), **kwargs)
    ta, tb = TiffSlide(out_a), TiffSlide(out_b)
    a = ta.read_region((0, 0), 0, ta.dimensions)
    b = tb.read_region((0, 0), 0, tb.dimensions)
    np.testing.assert_array_equal(a, b)
    assert (a.sum(axis=-1) > 0).mean() > 0.99
    ta.close(); tb.close()


def test_wsi_fetch_uint8_matches_f16(inference_setup, tmp_path):
    """On-device uint8 quantized fetch (half the transfer) must agree with
    the f16 fetch within 1 uint8 LSB everywhere (exact weight-sum division
    bounds the seam error — see infer/wsi.py)."""
    cfg, ckpt_dir, vit_cfg, (model, variables) = inference_setup
    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer import wsi_inference

    rng = np.random.default_rng(13)
    he = rng.integers(60, 255, (3, 160, 128), dtype=np.uint8)
    slide_path = str(tmp_path / "wsi4.tiff")
    write_pyramid(slide_path, he, n_levels=2, tile_size=32)
    norm = Normalizer({"mean": [180.0] * 3, "std": [40.0] * 3}, "he")
    kwargs = dict(tile_size=32, overlap=8, batch_size=2, tissue_only=False,
                  n_pyramid_levels=2)
    out_f = wsi_inference(model, variables, slide_path,
                          str(tmp_path / "f.ome.tiff"),
                          ["CD31", "CD3e", "Ki67"], norm, **kwargs)
    out_u = wsi_inference(model, variables, slide_path,
                          str(tmp_path / "u.ome.tiff"),
                          ["CD31", "CD3e", "Ki67"], norm,
                          fetch_uint8=True, **kwargs)
    tf_, tu = TiffSlide(out_f), TiffSlide(out_u)
    a = tf_.read_region((0, 0), 0, tf_.dimensions).astype(np.int32)
    b = tu.read_region((0, 0), 0, tu.dimensions).astype(np.int32)
    diff = np.abs(a - b)
    assert diff.max() <= 1, diff.max()
    assert np.median(diff) == 0
    tf_.close(); tu.close()


def test_wsi_inference_mesh_matches_single_device(inference_setup, tmp_path):
    """Batch-sharded WSI inference over the 8-device CPU mesh must stitch
    bit-equal to the single-device path (VERDICT r1 #3)."""
    cfg, ckpt_dir, vit_cfg, (model, variables) = inference_setup
    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer import wsi_inference
    from mipheivit_tpu.parallel import make_mesh

    rng = np.random.default_rng(11)
    he = rng.integers(60, 255, (3, 128, 128), dtype=np.uint8)
    slide_path = str(tmp_path / "wsi3.tiff")
    write_pyramid(slide_path, he, n_levels=2, tile_size=32)
    norm = Normalizer({"mean": [180.0] * 3, "std": [40.0] * 3}, "he")
    kwargs = dict(tile_size=32, overlap=8, batch_size=8, tissue_only=False,
                  n_pyramid_levels=2)
    out_single = wsi_inference(model, variables, slide_path,
                               str(tmp_path / "s.ome.tiff"),
                               ["CD31", "CD3e", "Ki67"], norm, **kwargs)
    mesh = make_mesh(n_data=8)
    out_mesh = wsi_inference(model, variables, slide_path,
                             str(tmp_path / "m.ome.tiff"),
                             ["CD31", "CD3e", "Ki67"], norm, mesh=mesh,
                             **kwargs)
    ts, tm = TiffSlide(out_single), TiffSlide(out_mesh)
    a = ts.read_region((0, 0), 0, ts.dimensions)
    b = tm.read_region((0, 0), 0, tm.dimensions)
    np.testing.assert_array_equal(a, b)
    ts.close(); tm.close()


def test_flax_state_dict_roundtrip(tmp_path, rng):
    """Non-MIPHEI generator export format: flattened flax safetensors
    roundtrip (reference exports every generator — callbacks.py:121-149)."""
    from mipheivit_tpu.train.checkpoints import (
        flax_state_dict, load_flax_state_dict)
    from safetensors.numpy import load_file

    params = {"enc": {"w": rng.standard_normal((3, 4)).astype(np.float32)},
              "head": {"b": np.zeros(7, np.float32)}}
    stats = {"bn": {"mean": np.ones(7, np.float32)}}
    sd = flax_state_dict(params, stats)
    path = str(tmp_path / "gen.safetensors")
    save_safetensors(sd, path)
    back = load_file(path)
    p2, s2 = load_flax_state_dict(back)
    jax.tree.map(np.testing.assert_array_equal, params, p2)
    jax.tree.map(np.testing.assert_array_equal, stats, s2)


def test_orbax_snapshot_retention(tmp_path):
    """save_train_state prunes snapshots beyond keep_last (each embeds the
    frozen encoder — tens of GB over a run otherwise); latest_checkpoint
    and restore keep working on the survivor."""
    import jax.numpy as jnp

    from mipheivit_tpu.train.checkpoints import (
        latest_checkpoint, restore_train_state, save_train_state)

    tree = {"w": jnp.ones((2, 2)), "step": jnp.zeros((), jnp.int32)}
    d = str(tmp_path / "orbax")
    for s in (1, 5, 9, 12):
        save_train_state(tree, d, step=s, keep_last=2)
    assert {p.name for p in Path(d).glob("state_*")} == {"state_9",
                                                         "state_12"}
    back = restore_train_state(
        latest_checkpoint(d),
        {"w": np.zeros((2, 2), np.float32), "step": np.zeros((), np.int32)})
    np.testing.assert_array_equal(back["w"], np.ones((2, 2)))
    # keep_last=0 disables pruning
    save_train_state(tree, d, step=20, keep_last=0)
    assert len(list(Path(d).glob("state_*"))) == 3


def test_tile_server_from_checkpoint(inference_setup, monkeypatch):
    """Production serving path e2e: TileServer.from_checkpoint on a
    reference-format checkpoint dir serves HTTP predictions that match the
    direct normalized forward through the uint8 output codec."""
    import io
    import urllib.request

    cfg, ckpt_dir, vit_cfg, (model, variables) = inference_setup
    import mipheivit_tpu.infer.loading as loading

    monkeypatch.setattr(
        loading, "build_generator",
        lambda cfg, img_size, nc_out, dtype="float32":
        MipheiViT(vit_cfg=vit_cfg, out_chans=nc_out))

    from mipheivit_tpu.data.stats import Normalizer, get_input_mean_std
    from mipheivit_tpu.infer import TileServer
    from mipheivit_tpu.infer.tiles import predictions_to_uint8

    server = TileServer.from_checkpoint(ckpt_dir, tile_size=32, batch_size=2,
                                        max_delay_ms=5, host="127.0.0.1",
                                        port=0)
    server.start()
    try:
        rng = np.random.default_rng(7)
        tile = rng.integers(0, 256, (32, 32, 3), np.uint8)
        buf = io.BytesIO()
        np.save(buf, tile)
        req = urllib.request.Request(
            f"http://{server.host}:{server.port}/v1/predict",
            data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["X-Markers"] == "CD31,CD3e,Ki67"
            pred = np.load(io.BytesIO(r.read()))
        assert pred.shape == (32, 32, 3) and pred.dtype == np.uint8

        # oracle: same checkpoint through load_generator + host normalizer.
        # The served model has fast heads + merged LoRA (exact-numerics
        # transforms), so agreement is within the codec rounding step.
        from mipheivit_tpu.data.stats import load_channel_stats
        from mipheivit_tpu.infer.loading import load_generator

        channel_stats = load_channel_stats(cfg.data.channel_stats_path)
        norm = Normalizer(get_input_mean_std(
            cfg.model.model_name, cfg.select("model.encoder.encoder_name"),
            channel_stats.rgb), mode="he")
        m2, v2 = load_generator(cfg, ckpt_dir, (32, 32), 3)
        x = jnp.asarray(norm(tile[None].astype(np.float32)))
        ref = predictions_to_uint8(np.asarray(m2.apply(v2, x, train=False))[0])
        assert np.abs(pred.astype(int) - ref.astype(int)).max() <= 1
    finally:
        server.stop()


def test_wsi_overlapped_fetch_matches_serial(inference_setup, tmp_path):
    """fetch_workers>1 overlaps device->host result copies; stitching
    consumes them in dispatch order, so the output must be bit-identical
    to the serial fetch_workers=1 path."""
    cfg, ckpt_dir, vit_cfg, (model, variables) = inference_setup
    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer import wsi_inference

    rng = np.random.default_rng(17)
    he = rng.integers(60, 255, (3, 160, 128), dtype=np.uint8)
    slide_path = str(tmp_path / "wsi5.tiff")
    write_pyramid(slide_path, he, n_levels=2, tile_size=32)
    norm = Normalizer({"mean": [180.0] * 3, "std": [40.0] * 3}, "he")
    kwargs = dict(tile_size=32, overlap=8, batch_size=2, tissue_only=False,
                  n_pyramid_levels=2)
    stats_par: dict = {}
    out_s = wsi_inference(model, variables, slide_path,
                          str(tmp_path / "s.ome.tiff"),
                          ["CD31", "CD3e", "Ki67"], norm,
                          fetch_workers=1, **kwargs)
    out_p = wsi_inference(model, variables, slide_path,
                          str(tmp_path / "p.ome.tiff"),
                          ["CD31", "CD3e", "Ki67"], norm,
                          fetch_workers=4, stats=stats_par, **kwargs)
    ts_, tp = TiffSlide(out_s), TiffSlide(out_p)
    a = ts_.read_region((0, 0), 0, ts_.dimensions)
    b = tp.read_region((0, 0), 0, tp.dimensions)
    np.testing.assert_array_equal(a, b)
    ts_.close(); tp.close()
    # all tiles flowed through the overlapped path
    assert stats_par["n_tiles"] == stats_par["steady_tiles"] + kwargs["batch_size"]
