"""End-to-end training driver on synthetic data (tiny model, 2 epochs)."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from mipheivit_tpu.config import compose
from mipheivit_tpu.models import MipheiViT, ViTConfig
from mipheivit_tpu.slideio import write_pyramid


@pytest.fixture
def synthetic_run(tmp_path, rng, monkeypatch):
    """Tile tree + dataframes + channel stats + tiny-model config."""
    import cv2

    tiles = tmp_path / "tiles"
    tiles.mkdir()
    markers = ["CD31", "CD3e"]
    rows = []
    for i in range(12):
        he = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        mif = rng.integers(0, 255, (2, 32, 32), dtype=np.uint8)
        nuc = np.zeros((1, 32, 32), np.int32)
        nuc[0, 4:20, 4:20] = 100 + i
        img = str(tiles / f"t{i}.png")
        cv2.imwrite(img, cv2.cvtColor(he, cv2.COLOR_RGB2BGR))
        targ = str(tiles / f"t{i}_mif.tiff")
        write_pyramid(targ, mif, n_levels=1, tile_size=32)
        nucp = str(tiles / f"t{i}_nuc.tiff")
        write_pyramid(nucp, nuc, n_levels=1, tile_size=32)
        rows.append({"image_path": img, "target_path": targ,
                     "nuclei_path": nucp, "in_slide_name": "s0",
                     "CD31_count": i, "CD31_prop": 0.1,
                     "CD3e_count": 12 - i, "CD3e_prop": 0.05})
    df = pd.DataFrame(rows)
    train_csv = tmp_path / "train.csv"
    df.iloc[:8].to_csv(train_csv, index=False)
    val_csv = tmp_path / "val.csv"
    df.iloc[8:10].to_csv(val_csv, index=False)
    test_csv = tmp_path / "test.csv"
    df.iloc[10:].to_csv(test_csv, index=False)

    cells = pd.DataFrame([{"label": 100 + i, "CD31_pos": i % 2 == 0,
                           "CD3e_pos": i % 3 == 0} for i in range(12)])
    cells_csv = tmp_path / "cells.csv"
    cells.to_csv(cells_csv, index=False)
    slide_csv = tmp_path / "slides.csv"
    pd.DataFrame([{"in_slide_name": "s0", "in_slide_path": "",
                   "targ_slide_path": "", "nuclei_slide_path": "",
                   "nuclei_csv_path": str(cells_csv)}]).to_csv(
        slide_csv, index=False)

    stats = {
        "RGB": {"mean": [180.0, 140.0, 170.0], "std": [40.0, 45.0, 35.0]},
        "CD31": {"idx_channel": 0, "std": 10.0, "min": 0, "is_structural": True},
        "CD3e": {"idx_channel": 1, "std": 12.0, "min": 0, "is_structural": False},
    }
    stats_path = tmp_path / "channel_stats.json"
    stats_path.write_text(json.dumps(stats))

    cfg = compose(["+default_configs=miphei-vit"])
    cfg.data.train_dataframe_path = str(train_csv)
    cfg.data.val_dataframe_path = str(val_csv)
    cfg.data.test_dataframe_path = str(test_csv)
    cfg.data.slide_dataframe_path = str(slide_csv)
    cfg.data.channel_stats_path = str(stats_path)
    cfg.data.targ_channel_names = markers
    cfg.data.augmentation_dir = None
    cfg.train.epochs = 2
    cfg.train.batch_size = 4
    cfg.train.use_cell_metrics = True
    cfg.train.gan_train = True
    cfg.train.gan_mode = "structural"

    tiny = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                     num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                     attn_impl="xla", remat=False, lora_rank=4)
    import mipheivit_tpu.train.trainer as trainer_mod

    monkeypatch.setattr(
        trainer_mod, "get_generator",
        lambda name, w, ci, co, cfg, dtype="float32":
        MipheiViT(vit_cfg=tiny, out_chans=co))
    return cfg, tmp_path


def test_train_patchgan_end_to_end(synthetic_run):
    from mipheivit_tpu.train.trainer import train_patchgan

    cfg, tmp_path = synthetic_run
    logdir = tmp_path / "run"
    out = train_patchgan(cfg, str(logdir), dtype="float32", use_wandb=False)

    assert (logdir / "config.yaml").exists()
    assert (logdir / "status.txt").read_text() == "finished"
    assert (logdir / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in (logdir / "metrics.jsonl").read_text().splitlines()]
    epoch_logs = [l for l in lines if "val_psnr" in l]
    assert len(epoch_logs) >= 2
    assert np.isfinite(epoch_logs[-1]["val_psnr"])
    assert "val_cell_auc" in epoch_logs[-1]
    # best-checkpoint exports exist (monitor = val_cell_auc, mode max)
    assert (logdir / "model.safetensors").exists()
    assert (logdir / "orbax").exists()
    # GAN was actually training
    gan_logs = [l for l in lines if "disc_adv_loss" in l]
    assert gan_logs and np.isfinite(gan_logs[-1]["disc_adv_loss"])
    # test epoch ran
    assert any("test_psnr" in l for l in lines)


def test_train_resume(synthetic_run):
    """Mid-training resume from the orbax snapshot (new capability)."""
    from mipheivit_tpu.train.trainer import train_patchgan

    cfg, tmp_path = synthetic_run
    cfg.train.epochs = 1
    cfg.train.gan_train = False
    cfg.train.use_cell_metrics = False
    cfg.train.callbacks.modelcheckpoint.monitor = "val_gen_loss_sim"
    cfg.train.callbacks.modelcheckpoint.mode = "min"
    logdir = tmp_path / "resume_run"
    train_patchgan(cfg, str(logdir), dtype="float32", use_wandb=False)

    cfg.train.epochs = 2
    out = train_patchgan(cfg, str(logdir), dtype="float32", use_wandb=False,
                         resume=True)
    # resumed: second run continues from epoch 1, ends at step >= 3
    import jax
    assert int(out["state"].step) >= 3


def test_test_driver(synthetic_run, monkeypatch):
    """run_test.py path: eval-only from a finished checkpoint dir."""
    import json as _json

    from mipheivit_tpu.train.trainer import train_patchgan
    from mipheivit_tpu.train.test_driver import test_model
    import mipheivit_tpu.infer.loading as loading
    from mipheivit_tpu.models import MipheiViT, ViTConfig

    cfg, tmp_path = synthetic_run
    cfg.train.epochs = 1
    logdir = tmp_path / "td_run"
    train_patchgan(cfg, str(logdir), dtype="float32", use_wandb=False)
    assert (logdir / "model.safetensors").exists()

    tiny = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                     num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                     attn_impl="xla", remat=False, lora_rank=4)
    monkeypatch.setattr(
        loading, "build_generator",
        lambda cfg, img_size, nc_out, dtype="float32":
        MipheiViT(vit_cfg=tiny, out_chans=nc_out))
    results = test_model(cfg, str(logdir), "td_run", dtype="float32")
    assert np.isfinite(results["test_psnr"])
    assert np.isfinite(results["val_cell_auc"])
    assert (logdir / "test_dataframe_cell.csv").exists()


def test_train_seq_sharded_whole_region(synthetic_run, monkeypatch):
    """Whole-region training path through the trainer: token axis sharded
    over a dp2 x sp4 mesh (model.attn_impl=seq_shard), prefix tokens make
    S=69 exercise the non-divisible pad, run finishes with finite
    metrics."""
    import mipheivit_tpu.train.trainer as trainer_mod
    from mipheivit_tpu.models import MipheiViT, ViTConfig
    from mipheivit_tpu.train.trainer import train_patchgan

    cfg, tmp_path = synthetic_run
    cfg.set_dotted("model.attn_impl", "seq_shard")
    cfg.train.mesh.num_model_shards = 4
    cfg.train.epochs = 1
    cfg.train.gan_train = False
    cfg.train.use_cell_metrics = False
    cfg.train.callbacks.modelcheckpoint.monitor = "val_gen_loss_sim"
    cfg.train.callbacks.modelcheckpoint.mode = "min"

    tiny = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                     num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                     attn_impl="seq_shard", remat=False, lora_rank=4)
    monkeypatch.setattr(
        trainer_mod, "get_generator",
        lambda name, w, ci, co, cfg, dtype="float32":
        MipheiViT(vit_cfg=tiny, out_chans=co))

    logdir = tmp_path / "seqshard_run"
    train_patchgan(cfg, str(logdir), dtype="float32", use_wandb=False)
    assert (logdir / "status.txt").read_text() == "finished"
    lines = [json.loads(l)
             for l in (logdir / "metrics.jsonl").read_text().splitlines()]
    epoch_logs = [l for l in lines if "val_psnr" in l]
    assert epoch_logs and np.isfinite(epoch_logs[-1]["val_psnr"])


def test_train_seq_sharded_rejects_bad_shard_count(synthetic_run):
    """seq_shard with the default num_model_shards=1 (or more shards than
    devices) is a config error with a clear message, not an opaque mesh
    reshape failure (ADVICE r3 medium)."""
    from mipheivit_tpu.train.trainer import train_patchgan

    cfg, tmp_path = synthetic_run
    cfg.set_dotted("model.attn_impl", "seq_shard")
    cfg.train.epochs = 1
    cfg.train.gan_train = False
    cfg.train.use_cell_metrics = False
    for bad in (1, 1024):
        cfg.train.mesh.num_model_shards = bad
        with pytest.raises(ValueError, match="num_model_shards"):
            train_patchgan(cfg, str(tmp_path / f"bad_{bad}"),
                           dtype="float32", use_wandb=False)


def test_train_with_grad_accumulation(synthetic_run, monkeypatch):
    """train.grad_accum_steps=2 through the full trainer: the run finishes
    with finite metrics and an exported checkpoint (microbatch-2 x accum-2
    == effective batch 4 of the plain config)."""
    import mipheivit_tpu.train.trainer as trainer_mod
    from mipheivit_tpu.models import MipheiViT, ViTConfig
    from mipheivit_tpu.train.trainer import train_patchgan

    cfg, tmp_path = synthetic_run
    cfg.train.epochs = 1
    cfg.train.batch_size = 2
    cfg.train.grad_accum_steps = 2
    cfg.train.use_cell_metrics = False
    cfg.train.callbacks.modelcheckpoint.monitor = "val_gen_loss_sim"
    cfg.train.callbacks.modelcheckpoint.mode = "min"

    tiny = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                     num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                     attn_impl="xla", remat=False, lora_rank=4)
    monkeypatch.setattr(
        trainer_mod, "get_generator",
        lambda name, w, ci, co, cfg, dtype="float32":
        MipheiViT(vit_cfg=tiny, out_chans=co))

    logdir = tmp_path / "accum_run"
    result = train_patchgan(cfg, str(logdir), dtype="float32",
                            use_wandb=False)
    assert (logdir / "status.txt").read_text() == "finished"
    assert np.isfinite(result["history"][-1]["test_psnr"])
    assert (logdir / "model.safetensors").exists()


def test_preemption_snapshot_and_resume(synthetic_run, monkeypatch):
    """Graceful preemption: SIGTERM mid-epoch -> orbax snapshot +
    status.txt=preempted + clean return; run.py --resume semantics then
    finish the run (TPU-VM preemption story; the reference can only die)."""
    import os
    import signal

    import mipheivit_tpu.train.trainer as trainer_mod
    from mipheivit_tpu.models import MipheiViT, ViTConfig
    from mipheivit_tpu.train.trainer import train_patchgan

    cfg, tmp_path = synthetic_run
    cfg.train.epochs = 2
    cfg.train.gan_train = False
    cfg.train.use_cell_metrics = False
    cfg.train.callbacks.modelcheckpoint.monitor = "val_gen_loss_sim"
    cfg.train.callbacks.modelcheckpoint.mode = "min"

    tiny = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                     num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                     attn_impl="xla", remat=False, lora_rank=4)
    monkeypatch.setattr(
        trainer_mod, "get_generator",
        lambda name, w, ci, co, cfg, dtype="float32":
        MipheiViT(vit_cfg=tiny, out_chans=co))

    # deterministic "preemption": deliver SIGTERM to ourselves after the
    # second training batch of the first epoch
    orig_prefetch = trainer_mod.device_prefetch

    def prefetch_and_kill(loader, **kw):
        # the fixture's train epoch is 2 batches (8 rows / batch 4,
        # drop_last): fire after the first so the break happens mid-epoch
        for j, b in enumerate(orig_prefetch(loader, **kw)):
            if j == 1:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    logdir = tmp_path / "preempt_run"
    trainer_mod.device_prefetch = prefetch_and_kill
    try:
        result = train_patchgan(cfg, str(logdir), dtype="float32",
                                use_wandb=False)
    finally:
        trainer_mod.device_prefetch = orig_prefetch
    assert result.get("preempted") is True
    assert (logdir / "status.txt").read_text() == "preempted"
    from mipheivit_tpu.train.checkpoints import latest_checkpoint

    ckpt = latest_checkpoint(str(logdir / "orbax"))
    assert ckpt is not None
    # the loop-top preempt check breaks before the batch that followed
    # the signal, so exactly one step completed
    step_at_preempt = int(result["state"].step)
    assert step_at_preempt >= 1

    result2 = train_patchgan(cfg, str(logdir), dtype="float32",
                             use_wandb=False, resume=True)
    assert (logdir / "status.txt").read_text() == "finished"
    assert int(result2["state"].step) > step_at_preempt
    assert np.isfinite(result2["history"][-1]["test_psnr"])


def test_nan_guard_forensics(synthetic_run, monkeypatch):
    """First-NaN forensics: the device-side accumulator names the exact
    offending step even though scalars are only fetched every ``log_every``
    steps (reference dumps on the same step, src/models.py:102-105)."""
    import jax.numpy as jnp
    import mipheivit_tpu.train.trainer as trainer_mod
    from mipheivit_tpu.train.trainer import train_patchgan

    cfg, tmp_path = synthetic_run
    cfg.train.epochs = 1
    cfg.train.gan_train = False
    cfg.train.use_cell_metrics = False
    cfg.train.callbacks.modelcheckpoint.monitor = "val_gen_loss_sim"
    cfg.train.callbacks.modelcheckpoint.mode = "min"

    real_prefetch = trainer_mod.device_prefetch

    def corrupting_prefetch(loader, mesh=None, size=2):
        for i, batch in enumerate(real_prefetch(loader, mesh=mesh, size=size)):
            if i == 1:  # second train batch -> NaN output at global step 2
                batch = dict(batch)
                batch["image"] = batch["image"] * jnp.float32(np.nan)
            yield batch

    monkeypatch.setattr(trainer_mod, "device_prefetch", corrupting_prefetch)
    logdir = tmp_path / "nan_run"
    with pytest.raises(ValueError, match=r"first at step 2"):
        train_patchgan(cfg, str(logdir), dtype="float32", use_wandb=False)
    assert (logdir / "weights_nan.safetensors").exists()
    assert (logdir / "weights_nan.step").read_text().strip() == "2"
