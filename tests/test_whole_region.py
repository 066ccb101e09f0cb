"""Whole-region encoding end-to-end (SURVEY §5 long-context plan).

The reference tiles slides into 256 px crops because torch attention at
region scale would materialize the [S, S] probs (read_pyramid.py tiling +
src/dataset.py crops). Here the same generator runs a full 1024^2 region
in one shot: patch-16 -> 64x64 grid -> 4k+ tokens routes through the
long-sequence flash kernel (forward) and its Pallas block-recompute
backward inside a *real train step*, and a 256 px checkpoint loads at
1024 px via bicubic pos-embed re-gridding (the exact path
``run_inference.py --wsi --tile_size 1024`` takes).

On CPU the Pallas kernels run in interpret mode automatically; on TPU the
same config compiles the real kernels (memory figure in BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipheivit_tpu.models import MipheiViT, ViTConfig

REGION = 1024


def _region_model(attn_impl: str, out: int = 2) -> MipheiViT:
    cfg = ViTConfig(
        img_size=(REGION, REGION), patch_size=16, embed_dim=64, depth=2,
        num_heads=2, mlp_hidden_dim=128, reg_tokens=4, no_embed_class=True,
        attn_impl=attn_impl, remat=False, lora_rank=2,
    )
    return MipheiViT(vit_cfg=cfg, out_chans=out)


@pytest.mark.slow
def test_whole_region_train_step_flash_forward_backward(rng):
    """One real train step on a 1024^2 region: >4k tokens through the
    flash forward + Pallas block-recompute backward, loss finite, params
    move, and the flash forward matches the XLA reference path."""
    from mipheivit_tpu.train.losses import weighted_mse_loss
    from mipheivit_tpu.train.optim import build_generator_optimizer
    from mipheivit_tpu.train.steps import (
        StepConfig, create_train_state, make_train_step)

    model = _region_model("flash")
    assert model.vit_cfg.grid_size == (64, 64)          # 4096 tokens + 5
    batch = {
        "image": rng.standard_normal((1, REGION, REGION, 3)).astype(np.float32),
        "target": rng.uniform(-0.9, 0.9, (1, REGION, REGION, 2)).astype(np.float32),
    }
    gen_opt = build_generator_optimizer("myvitmatte", 1e-3, 100)
    state = create_train_state(jax.random.PRNGKey(0), model, gen_opt,
                               sample_batch=batch)

    # forward parity: flash long-seq kernel vs the XLA attention chain
    out_flash = model.apply(
        {"params": state.gen_params, "batch_stats": state.gen_batch_stats},
        jnp.asarray(batch["image"]), train=False)
    out_xla = _region_model("xla").apply(
        {"params": state.gen_params, "batch_stats": state.gen_batch_stats},
        jnp.asarray(batch["image"]), train=False)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla),
                               atol=2e-4, rtol=1e-3)

    loss_fn = weighted_mse_loss(50.0, np.ones(2, np.float32))
    train_step = jax.jit(make_train_step(model, loss_fn, gen_opt,
                                         cfg=StepConfig(gan_train=False)))
    from mipheivit_tpu.metrics import PixelMetrics

    p0 = jax.tree.map(np.asarray, state.gen_params)
    metrics = PixelMetrics.zeros()
    for _ in range(3):  # LR warmup factor is 0 at step 0
        state, metrics, log = train_step(state, batch, metrics)
    assert np.isfinite(float(log["gen_loss_sim"]))
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                         - np.asarray(b, np.float32)))),
        p0, jax.tree.map(np.asarray, state.gen_params))
    assert max(jax.tree.leaves(moved)) > 0.0


def test_region_load_regrids_pos_embed(rng):
    """A 256 px checkpoint loads at region size: the exported torch-layout
    state dict re-imports with the pos embed bicubically re-gridded from
    the 16x16 to the 64x64 patch grid (timm resample_abs_pos_embed parity
    — the path ``infer.loading.load_generator`` takes for --tile_size
    1024)."""
    from mipheivit_tpu.models.import_weights import (
        mipheivit_from_torch, resample_pos_embed)
    from mipheivit_tpu.train.checkpoints import mipheivit_state_dict

    small_cfg = ViTConfig(
        img_size=(256, 256), patch_size=16, embed_dim=64, depth=2,
        num_heads=2, mlp_hidden_dim=128, reg_tokens=4, no_embed_class=True,
        attn_impl="xla", remat=False, lora_rank=2,
    )
    small = MipheiViT(vit_cfg=small_cfg, out_chans=2)
    v = small.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 256, 256, 3)), train=False)
    sd = mipheivit_state_dict(
        jax.tree.map(np.asarray, v["params"]),
        jax.tree.map(np.asarray, v.get("batch_stats", {})),
        small_cfg, 2)

    region_cfg = small_cfg.replace(img_size=(REGION, REGION))
    params, _ = mipheivit_from_torch(sd, region_cfg, out_chans=2)
    pos = params["encoder"]["vit"]["pos_embed"]
    assert pos.shape == (1, 64 * 64, 64)
    old = np.asarray(v["params"]["encoder"]["vit"]["pos_embed"])
    expect = resample_pos_embed(old, (64, 64), num_prefix_tokens=0,
                                old_grid=(16, 16))
    np.testing.assert_allclose(np.asarray(pos), expect, atol=1e-5, rtol=1e-5)
