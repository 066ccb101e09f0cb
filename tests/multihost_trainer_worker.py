"""Worker for the 2-process ``train_patchgan`` e2e test (VERDICT r4 #6).

Run as ``python multihost_trainer_worker.py <pid> <nprocs> <port>
<fixture_dir> <logdir> <out.json> [--resume]`` with ``JAX_PLATFORMS=cpu``.
Each process is one host of a JAX distributed system and drives the REAL
trainer — ``mipheivit_tpu.train.trainer.train_patchgan`` — on the synthetic
fixture the parent test laid down. The tiny generator is substituted the
same way the single-process e2e test does it (module attribute, no
pytest dependency here).

The parent asserts: equal per-host step counts with an uneven shard,
synchronized preemption (SIGTERM delivered to ONE process must exit BOTH
cleanly through the allgathered flag — the docs/ROUND4.md deadlock
scenario), main-only artifact writes, and mid-run resume.
"""

import json
import sys
from pathlib import Path


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, fixture_dir, logdir, out_path = sys.argv[3:7]
    resume = "--resume" in sys.argv[7:]

    import jax

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs

    sys.path.insert(0, str(Path(__file__).parent.parent))

    from mipheivit_tpu.config import compose
    from mipheivit_tpu.models import MipheiViT, ViTConfig
    import mipheivit_tpu.train.trainer as trainer_mod

    fixture = Path(fixture_dir)
    cfg = compose(["+default_configs=miphei-vit"])
    cfg.data.train_dataframe_path = str(fixture / "train.csv")
    cfg.data.val_dataframe_path = str(fixture / "val.csv")
    cfg.data.test_dataframe_path = str(fixture / "test.csv")
    cfg.data.slide_dataframe_path = None
    cfg.data.channel_stats_path = str(fixture / "channel_stats.json")
    cfg.data.targ_channel_names = ["CD31", "CD3e"]
    cfg.data.augmentation_dir = None
    cfg.train.epochs = 4
    cfg.train.batch_size = 2
    cfg.train.use_cell_metrics = False
    cfg.train.gan_train = True
    cfg.train.data_sampler.use_sampler = False
    # no cell metrics in this fixture -> monitor a pixel metric so the
    # best-checkpoint export path actually runs
    cfg.train.callbacks.modelcheckpoint.monitor = "val_psnr"
    cfg.train.callbacks.modelcheckpoint.mode = "max"

    tiny = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                     num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                     attn_impl="xla", remat=False, lora_rank=4)
    trainer_mod.get_generator = (
        lambda name, w, ci, co, cfg, dtype="float32":
        MipheiViT(vit_cfg=tiny, out_chans=co))

    if pid != 0:
        # single-writer proof: a non-main host must never construct the
        # writing logger nor export plain-file checkpoints (trainer.py
        # gates both on is_main) — make any attempt a hard failure
        def _boom(*a, **k):
            raise AssertionError(f"non-main host {pid} tried to write")

        trainer_mod.MetricsLogger = _boom
        trainer_mod.save_safetensors = _boom
        trainer_mod.save_config = _boom

    # count the train steps this host actually dispatched (epoch-boundary
    # counter exposed through the result's history/state)
    ready = Path(logdir) / f"worker{pid}.ready"
    ready.parent.mkdir(parents=True, exist_ok=True)
    ready.write_text("up")

    out = trainer_mod.train_patchgan(cfg, logdir, dtype="float32",
                                     use_wandb=False, resume=resume)

    state_step = int(out["state"].step)
    with open(out_path, "w") as f:
        json.dump({
            "pid": pid,
            "preempted": bool(out.get("preempted", False)),
            "state_step": state_step,
            "n_epoch_logs": len(out["history"]),
        }, f)


if __name__ == "__main__":
    main()
