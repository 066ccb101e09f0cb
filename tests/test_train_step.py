"""Train-step tests on a virtual 8-device CPU mesh (SURVEY.md §4 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mipheivit_tpu.metrics import PixelMetrics
from mipheivit_tpu.models import MipheiViT, ViTConfig
from mipheivit_tpu.models.discriminator import DiscriminatorPatch
from mipheivit_tpu.parallel import make_mesh, shard_batch, replicated
from mipheivit_tpu.train.losses import weighted_mse_loss
from mipheivit_tpu.train.optim import (
    build_discriminator_optimizer,
    build_generator_optimizer,
    trainable_mask,
)
from mipheivit_tpu.train.steps import (
    StepConfig,
    create_train_state,
    make_train_step,
    make_eval_step,
)


def _tiny_model(lora_rank=2, out=4):
    cfg = ViTConfig(
        img_size=(32, 32), patch_size=4, embed_dim=32, depth=2, num_heads=2,
        mlp_hidden_dim=64, reg_tokens=4, no_embed_class=True,
        attn_impl="xla", remat=False, lora_rank=lora_rank,
    )
    return MipheiViT(vit_cfg=cfg, out_chans=out)


def _batch(rng, b=8, out=4):
    return {
        "image": rng.standard_normal((b, 32, 32, 3)).astype(np.float32),
        "target": rng.uniform(-0.9, 0.9, (b, 32, 32, out)).astype(np.float32),
    }


def test_train_step_gan_updates_and_freezing(rng):
    model = _tiny_model()
    disc = DiscriminatorPatch(ndf=8, n_layers=2)
    loss_fn = weighted_mse_loss(50.0, np.ones(4, np.float32))
    batch = _batch(rng)
    gen_opt = build_generator_optimizer("myvitmatte", 1e-3, 100)
    state = create_train_state(
        jax.random.PRNGKey(0), model, gen_opt, disc,
        build_discriminator_optimizer(1e-3, 100), sample_batch=batch)
    step_cfg = StepConfig(gan_train=True)
    train_step = jax.jit(make_train_step(
        model, loss_fn, gen_opt, disc,
        build_discriminator_optimizer(1e-3, 100), step_cfg))

    metrics = PixelMetrics.zeros()
    p0 = jax.tree.map(np.asarray, state.gen_params)
    # note: LR warmup factor is 0 at step 0 (torch LambdaLR parity), so run
    # 3 steps; LoRA B gets nonzero updates from step 2 on (A from step 3:
    # its grad is 0 while B == 0).
    state, metrics, log = train_step(state, batch, metrics)
    state, metrics, log = train_step(state, _batch(rng), metrics)
    state, metrics, log = train_step(state, _batch(rng), metrics)
    assert np.isfinite(float(log["gen_loss"]))
    assert np.isfinite(float(log["disc_adv_loss"]))
    assert not bool(log["nan"])
    assert int(state.step) == 3

    p1 = jax.tree.map(np.asarray, state.gen_params)
    # frozen encoder weights bit-identical; LoRA + decoder moved
    qkv0 = p0["encoder"]["vit"]["blocks"]["attn"]["qkv"]["kernel"]
    qkv1 = p1["encoder"]["vit"]["blocks"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(qkv0, qkv1)
    lora0 = p0["encoder"]["vit"]["blocks"]["attn"]["lora_q"]["B"]
    lora1 = p1["encoder"]["vit"]["blocks"]["attn"]["lora_q"]["B"]
    assert np.abs(lora1 - lora0).max() > 0
    d0 = p0["decoder"]["fusion_blks_0"]["conv"]["conv"]["kernel"]
    d1 = p1["decoder"]["fusion_blks_0"]["conv"]["conv"]["kernel"]
    assert np.abs(d1 - d0).max() > 0

    out = metrics.compute()
    assert np.isfinite(float(out["psnr"]))
    assert -1.0 <= float(out["ssim"]) <= 1.0


def test_train_step_sharded_over_mesh(rng):
    """Same step, batch sharded over an 8-device CPU mesh: XLA inserts the
    gradient all-reduce; result must match the expected API and stay finite."""
    assert jax.device_count() == 8
    mesh = make_mesh()
    model = _tiny_model()
    loss_fn = weighted_mse_loss(50.0, np.ones(4, np.float32))
    gen_opt = build_generator_optimizer("myvitmatte", 1e-3, 100)
    batch = _batch(rng, b=16)
    state = create_train_state(jax.random.PRNGKey(0), model, gen_opt,
                               sample_batch=batch)
    train_step = jax.jit(make_train_step(model, loss_fn, gen_opt))

    state = jax.device_put(state, replicated(mesh))
    sharded = shard_batch(batch, mesh)
    metrics = jax.device_put(PixelMetrics.zeros(), replicated(mesh))
    state, metrics, log = train_step(state, sharded, metrics)
    assert np.isfinite(float(log["gen_loss_sim"]))
    # replicated-param output remains replicated; batch-sharded inputs consumed
    assert int(state.step) == 1


def test_eval_step(rng):
    model = _tiny_model()
    loss_fn = weighted_mse_loss(50.0, np.ones(4, np.float32))
    gen_opt = build_generator_optimizer("myvitmatte", 1e-3, 100)
    batch = _batch(rng)
    state = create_train_state(jax.random.PRNGKey(0), model, gen_opt,
                               sample_batch=batch)
    eval_step = jax.jit(make_eval_step(model, loss_fn))
    metrics, log = eval_step(state, batch, PixelMetrics.zeros())
    assert log["pred"].shape == batch["target"].shape
    assert np.isfinite(float(log["gen_loss_sim"]))


def test_trainable_mask_paths():
    params = {
        "encoder": {"vit": {"blocks": {"attn": {
            "qkv": {"kernel": np.zeros(1)},
            "lora_q": {"A": np.zeros(1)},
        }}}},
        "decoder": {"conv": {"kernel": np.zeros(1)}},
    }
    mask = trainable_mask(params, "myvitmatte")
    assert mask["encoder"]["vit"]["blocks"]["attn"]["qkv"]["kernel"] is False
    assert mask["encoder"]["vit"]["blocks"]["attn"]["lora_q"]["A"] is True
    assert mask["decoder"]["conv"]["kernel"] is True
    mask_all = trainable_mask(params, "hemit")
    assert mask_all["encoder"]["vit"]["blocks"]["attn"]["qkv"]["kernel"] is True


def test_partitioned_step_matches_full_and_skips_frozen_moments(rng):
    """freeze_model_name partitions grads/moments to the trainable sub-tree:
    frozen encoder weights stay bit-identical, no Adam moments exist for
    them, and (with the global-norm clip inactive) trainable updates match
    the legacy full-tree step exactly."""
    import optax
    from flax import traverse_util
    from mipheivit_tpu.train.optim import partition_params

    model = _tiny_model()          # myvitmatte-style: frozen encoder + LoRA
    batch = _batch(rng)
    # tiny loss scale keeps the global grad norm << 1 so clip_by_global_norm
    # is the identity in both paths and updates must agree bit-for-bit
    loss_fn = lambda y, f: 1e-4 * jnp.mean((y - f) ** 2)

    def run(freeze):
        gen_opt = build_generator_optimizer("myvitmatte", 1e-3, 100)
        state = create_train_state(
            jax.random.PRNGKey(0), model, gen_opt, None, None,
            sample_batch=batch, freeze_model_name=freeze)
        step = jax.jit(make_train_step(
            model, loss_fn, gen_opt, None, None,
            StepConfig(freeze_model_name=freeze)))
        metrics = PixelMetrics.zeros()
        for _ in range(3):
            state, metrics, _ = step(state, batch, metrics)
        return state

    full = run(None)
    part = run("myvitmatte")

    flat_full = traverse_util.flatten_dict(
        jax.tree.map(np.asarray, full.gen_params))
    flat_part = traverse_util.flatten_dict(
        jax.tree.map(np.asarray, part.gen_params))
    assert flat_full.keys() == flat_part.keys()
    for k in flat_full:
        np.testing.assert_array_equal(
            flat_full[k], flat_part[k],
            err_msg="/".join(map(str, k)))

    # frozen weights unchanged from init
    init_t, init_f = partition_params(
        create_train_state(jax.random.PRNGKey(0), model,
                           build_generator_optimizer("myvitmatte", 1e-3, 100),
                           sample_batch=batch).gen_params, "myvitmatte")
    for k, v in traverse_util.flatten_dict(init_f).items():
        np.testing.assert_array_equal(np.asarray(v), flat_part[k])
    # but LoRA B did move after 3 steps (warmup is 0 at step 0)
    lora_b = [v for k, v in flat_part.items() if "B" in k and "lora" in "/".join(map(str, k))]
    assert any(np.abs(v).max() > 0 for v in lora_b)

    # no Adam moments exist for frozen paths
    mu = None
    for s in jax.tree_util.tree_leaves(
            part.gen_opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
        if isinstance(s, optax.ScaleByAdamState):
            mu = s.mu
    assert mu is not None
    mu_paths = {"/".join(map(str, k))
                for k in traverse_util.flatten_dict(mu)}
    assert all(("encoder" not in p) or ("lora" in p) for p in mu_paths), mu_paths
    n_frozen = len(traverse_util.flatten_dict(init_f))
    assert n_frozen > 0 and len(mu_paths) == len(flat_part) - n_frozen


@pytest.mark.parametrize("policy", ["full", "dots", "fc1", "mlp_only"])
def test_remat_policies_same_loss_and_grads(rng, policy):
    """Every remat_policy is a pure memory/recompute trade: loss and
    gradients must match the no-remat forward bit-for-bit-ish (f32 CPU).
    fc1 pins the named packed swiglu dot (ops/mlp.py), mlp_only remats
    only the MLP branch (vit.py Block)."""
    base = dict(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                num_heads=2, mlp_hidden_dim=64, mlp_type="swiglu",
                reg_tokens=4, no_embed_class=True, attn_impl="xla",
                lora_rank=2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 32, 32, 3)), jnp.float32)

    def loss_fn(model):
        def f(params, stats):
            out = model.apply({"params": params, "batch_stats": stats},
                              x, train=False)
            return jnp.mean((out - y) ** 2)
        return f

    ref_model = MipheiViT(vit_cfg=ViTConfig(remat=False, **base),
                          out_chans=3)
    variables = ref_model.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    ref_loss, ref_grads = jax.value_and_grad(loss_fn(ref_model))(params,
                                                                 stats)

    model = MipheiViT(
        vit_cfg=ViTConfig(remat=True, remat_policy=policy, **base),
        out_chans=3)
    loss, grads = jax.jit(jax.value_and_grad(loss_fn(model)))(params, stats)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5),
        grads, ref_grads)


def test_grad_accumulation_matches_mean_grad():
    """grad_accum_steps=k: the k-th microbatch triggers exactly the update
    the inner optimizer would produce for the mean of the k grads; the
    first k-1 updates are zero (optax.MultiSteps semantics through
    build_discriminator_optimizer)."""
    import optax

    from mipheivit_tpu.train.optim import build_discriminator_optimizer

    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros(3)}
    g1 = jax.tree.map(lambda x: jnp.full_like(x, 0.3), params)
    g2 = jax.tree.map(lambda x: jnp.full_like(x, -0.1), params)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)

    plain = build_discriminator_optimizer(1e-3, 100)
    s0 = plain.init(params)
    want, _ = plain.update(g_mean, s0, params)

    acc = build_discriminator_optimizer(1e-3, 100, grad_accum_steps=2)
    s = acc.init(params)
    u1, s = acc.update(g1, s, params)
    assert all(float(jnp.abs(v).max()) == 0.0
               for v in jax.tree.leaves(u1))       # no update mid-window
    u2, s = acc.update(g2, s, params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7), u2, want)
    # window resets: next microbatch is again a zero update
    u3, s = acc.update(g1, s, params)
    assert all(float(jnp.abs(v).max()) == 0.0
               for v in jax.tree.leaves(u3))
