"""End-to-end numerics parity: flax model + weight import vs torch oracle.

Tiny configs (dim 32, depth 2) keep it fast; every architectural mechanism
of the flagship is exercised: packed SwiGLU, layerscale, reg tokens,
no_embed_class pos embed, 14->16-style bicubic re-grid, conv/BN decoder,
attention-gated heads, LoRA grafting.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mipheivit_tpu.models import MipheiViT, ViTConfig, VisionTransformer
from mipheivit_tpu.models.import_weights import (
    detect_mlp_type,
    mipheivit_from_torch,
    resample_pos_embed,
    vit_params_from_torch,
)

from torch_oracle import OracleDecoder, OracleMiphei, OracleViT


def _tiny_cfg(**kw):
    base = dict(
        img_size=(32, 32), patch_size=4, embed_dim=32, depth=2, num_heads=2,
        mlp_hidden_dim=64, mlp_type="swiglu", init_values=1e-5,
        reg_tokens=4, no_embed_class=True, attn_impl="xla", remat=False,
    )
    base.update(kw)
    return ViTConfig(**base)


def _state(np_module):
    return {k: v.detach().numpy() for k, v in np_module.state_dict().items()}


@pytest.mark.parametrize("swiglu,reg,no_embed", [
    (True, 4, True),    # hoptimus0-style
    (False, 0, False),  # sp85m-style
])
def test_vit_matches_oracle(rng, swiglu, reg, no_embed):
    torch.manual_seed(0)
    oracle = OracleViT(img_size=32, patch=4, dim=32, depth=2, heads=2,
                       hidden=64, reg_tokens=reg, swiglu=swiglu,
                       ls=True, no_embed_class=no_embed).eval()
    cfg = _tiny_cfg(mlp_type="swiglu" if swiglu else "gelu",
                    reg_tokens=reg, no_embed_class=no_embed,
                    mlp_hidden_dim=64 if swiglu else 64)
    state = _state(oracle)
    assert detect_mlp_type(state) == ("swiglu" if swiglu else "gelu")
    params = vit_params_from_torch(state, cfg)

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(
        VisionTransformer(cfg).apply({"params": params}, jnp.array(x))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_mipheivit_matches_oracle(rng):
    torch.manual_seed(1)
    vit = OracleViT(img_size=32, patch=4, dim=32, depth=2, heads=2,
                    hidden=64, reg_tokens=4, swiglu=True)
    dec = OracleDecoder(emb=32, out_chans=3)
    oracle = OracleMiphei(vit, dec, num_prefix=5, grid=8, target_grid=2).eval()

    cfg = _tiny_cfg()
    params, batch_stats = mipheivit_from_torch(_state(oracle), cfg, out_chans=3)
    model = MipheiViT(vit_cfg=cfg, out_chans=3)

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(
        model.apply({"params": params, "batch_stats": batch_stats},
                    jnp.array(x), train=False)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_mipheivit_with_lora_from_stripped_ckpt(rng):
    """FM-stripped checkpoint + separate encoder state + LoRA grafting
    (reference: scripts/ckpt_remove_foundation_model.py parity)."""
    torch.manual_seed(2)
    vit = OracleViT(img_size=32, patch=4, dim=32, depth=2, heads=2,
                    hidden=64, reg_tokens=4, swiglu=True)
    dec = OracleDecoder(emb=32, out_chans=2)
    oracle = OracleMiphei(vit, dec, num_prefix=5, grid=8, target_grid=2).eval()
    full_state = _state(oracle)

    # split: encoder checkpoint (timm layout) + generator with encoder stripped
    enc_state = {k[len("encoder.vit."):]: v for k, v in full_state.items()
                 if k.startswith("encoder.vit.")}
    gen_state = {k: v for k, v in full_state.items()
                 if not k.startswith("encoder.vit.")}
    # add LoRA adapters in the reference's wrapped-qkv layout; B=0 => no-op
    r = 4
    for i in range(2):
        gen_state[f"encoder.vit.blocks.{i}.attn.qkv.lora_q.A"] = (
            rng.standard_normal((32, r)).astype(np.float32))
        gen_state[f"encoder.vit.blocks.{i}.attn.qkv.lora_q.B"] = np.zeros((r, 32), np.float32)
        gen_state[f"encoder.vit.blocks.{i}.attn.qkv.lora_v.A"] = (
            rng.standard_normal((32, r)).astype(np.float32))
        gen_state[f"encoder.vit.blocks.{i}.attn.qkv.lora_v.B"] = np.zeros((r, 32), np.float32)

    cfg = _tiny_cfg(lora_rank=r)
    params, batch_stats = mipheivit_from_torch(
        gen_state, cfg, out_chans=2, encoder_state=enc_state)
    model = MipheiViT(vit_cfg=cfg, out_chans=2)

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(
        model.apply({"params": params, "batch_stats": batch_stats},
                    jnp.array(x), train=False)
    ).transpose(0, 3, 1, 2)
    # B=0 adapters are exact no-ops -> output must still match the oracle
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)
    # nonzero B must change the output (adapters actually wired in); the
    # effect is strongly damped by layerscale gamma=1e-5, so perturb hard
    # and use a roundoff-level threshold.
    params["encoder"]["vit"]["blocks"]["attn"]["lora_q"]["B"] += 10.0
    params["encoder"]["vit"]["blocks"]["attn"]["lora_v"]["B"] += 10.0
    changed = np.asarray(
        model.apply({"params": params, "batch_stats": batch_stats},
                    jnp.array(x), train=False))
    assert np.abs(changed.transpose(0, 3, 1, 2) - ref).max() > 1e-6


def test_resample_pos_embed_matches_timm_semantics(rng):
    """bicubic+antialias resample, prefix preserved."""
    pos = rng.standard_normal((1, 1 + 9, 8)).astype(np.float32)
    out = resample_pos_embed(pos, (5, 5), num_prefix_tokens=1)
    assert out.shape == (1, 1 + 25, 8)
    np.testing.assert_array_equal(out[:, :1], pos[:, :1])
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(pos[:, 1:].reshape(1, 3, 3, 8).transpose(0, 3, 1, 2)),
        size=(5, 5), mode="bicubic", antialias=True,
    ).numpy().transpose(0, 2, 3, 1).reshape(1, 25, 8)
    np.testing.assert_allclose(out[:, 1:], ref, atol=1e-5)


def test_init_shapes_scanned():
    cfg = _tiny_cfg(scan_blocks=True, depth=3)
    model = VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    assert params["blocks"]["attn"]["qkv"]["kernel"].shape == (3, 32, 96)
    assert params["pos_embed"].shape == (1, 64, 32)


def test_fast_heads_match_per_head(rng):
    """BatchedSegHeads must reproduce the 16 per-head chains exactly."""
    from mipheivit_tpu.models.mipheivit import stack_head_params

    cfg = _tiny_cfg()
    slow = MipheiViT(vit_cfg=cfg, out_chans=5)
    x = jnp.array(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    variables = slow.init(jax.random.PRNGKey(3), x, train=False)
    ref = np.asarray(slow.apply(variables, x, train=False))

    fast = MipheiViT(vit_cfg=cfg, out_chans=5, fast_heads=True)
    hp, hs = stack_head_params(variables["params"]["decoder"],
                               variables["batch_stats"]["decoder"], 5)
    fparams = {k: v for k, v in variables["params"]["decoder"].items()
               if not k.startswith("segmentation_head_")}
    fstats = {k: v for k, v in variables["batch_stats"]["decoder"].items()
              if not k.startswith("segmentation_head_")}
    fparams["heads"] = hp
    fstats["heads"] = hs
    out = np.asarray(fast.apply(
        {"params": {**variables["params"], "decoder": fparams},
         "batch_stats": {**variables["batch_stats"], "decoder": fstats}},
        x, train=False))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_fused_seg_heads_pallas_matches_xla(rng):
    """The Pallas fused-heads kernel (interpret mode on CPU) must match the
    XLA BatchedSegHeads path on non-trivial BN stats."""
    from mipheivit_tpu.models.mipheivit import BatchedSegHeads

    b, h, w, c, k = 2, 16, 32, 8, 3
    x = jnp.array(rng.standard_normal((b, h, w, c)).astype(np.float32))
    xla = BatchedSegHeads(k, impl="xla")
    variables = xla.init(jax.random.PRNGKey(0), x, train=False)
    nfeat = k * (c // 2)
    variables = {
        "params": variables["params"],
        "batch_stats": {"psi_bn": {
            "mean": jnp.array(rng.standard_normal(nfeat), jnp.float32) * 0.3,
            "var": jnp.array(rng.uniform(0.5, 2.0, nfeat), jnp.float32),
        }},
    }
    ref = np.asarray(xla.apply(variables, x, train=False))
    pal = np.asarray(BatchedSegHeads(k, impl="pallas_interpret").apply(
        variables, x, train=False))
    np.testing.assert_allclose(pal, ref, atol=2e-5, rtol=1e-4)


def test_fast_heads_train_bn_matches_flax(rng):
    """The manual BatchNorm in BatchedSegHeads (train mode) must reproduce
    nn.BatchNorm(momentum=0.9) semantics: batch-stat normalization plus the
    running-stat EMA update."""
    import flax.linen as nn
    from mipheivit_tpu.models.mipheivit import BatchedSegHeads

    b, h, w, c, k = 2, 16, 16, 8, 3
    c2 = c // 2
    x = jnp.array(rng.standard_normal((b, h, w, c)).astype(np.float32))
    mod = BatchedSegHeads(k, impl="xla")
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    nfeat = k * c2
    stats0 = {"psi_bn": {
        "mean": jnp.array(rng.standard_normal(nfeat), jnp.float32) * 0.2,
        "var": jnp.array(rng.uniform(0.5, 2.0, nfeat), jnp.float32),
    }}
    variables = {"params": variables["params"], "batch_stats": stats0}

    out, mutated = mod.apply(variables, x, train=True,
                             mutable=["batch_stats"])

    # reference: rebuild the pre-BN activations and push them through a
    # real nn.BatchNorm with the same params/stats
    p = variables["params"]
    g = jnp.einsum("bhwc,kcd->bhwkd", x, p["psi_conv1_kernel"][:, 0, 0]) \
        + p["psi_conv1_bias"]
    g = g.reshape(b, h, w, nfeat)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    bn_vars = {"params": {"scale": p["psi_bn"]["scale"],
                          "bias": p["psi_bn"]["bias"]},
               "batch_stats": {"mean": stats0["psi_bn"]["mean"],
                               "var": stats0["psi_bn"]["var"]}}
    g_ref, bn_mut = bn.apply(bn_vars, g, mutable=["batch_stats"])

    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["psi_bn"]["mean"]),
        np.asarray(bn_mut["batch_stats"]["mean"]), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["psi_bn"]["var"]),
        np.asarray(bn_mut["batch_stats"]["var"]), atol=1e-6, rtol=1e-5)

    # and the full forward agrees with the reference chain built on g_ref
    gate = nn.sigmoid(
        jnp.einsum("bhwkd,kd->bhwk",
                   nn.relu(g_ref).reshape(b, h, w, k, c2),
                   p["psi_conv2_kernel"][:, 0, 0, :, 0])
        + p["psi_conv2_bias"][:, 0])
    wm = p["conv_kernel"][:, :, :, :, 0].transpose(3, 1, 2, 0).reshape(c, 9 * k)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    m = (x_pad.reshape(-1, c) @ wm).reshape(b, h + 2, w + 2, 9, k)
    gate_pad = jnp.pad(gate, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = sum(m[:, dy:dy + h, dx:dx + w, dy * 3 + dx]
              * gate_pad[:, dy:dy + h, dx:dx + w]
              for dy in range(3) for dx in range(3))
    ref = jnp.tanh(ref + p["conv_bias"][:, 0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_phase_packed_conv_matches_xla(rng):
    """BasicConv3x3's phase-packed TPU form (one 4x4/stride-2 conv over 4
    packed output phases + depth-to-space) must match the plain 3x3 conv."""
    from mipheivit_tpu.models.mipheivit import BasicConv3x3

    for (h, w, c, k) in [(16, 16, 8, 4), (32, 16, 67, 32)]:
        x = jnp.array(rng.standard_normal((2, h, w, c)).astype(np.float32))
        ref_mod = BasicConv3x3(k, stride=1, impl="xla")
        vs = ref_mod.init(jax.random.PRNGKey(0), x, train=False)
        ref = np.asarray(ref_mod.apply(vs, x, train=False))
        out = np.asarray(BasicConv3x3(k, stride=1, impl="phase_packed")
                         .apply(vs, x, train=False))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_flagship_geometry_golden_fixture():
    """Golden-fixture regression lock (VERDICT r3 #7): deterministic
    torch-layout checkpoint -> mipheivit_from_torch -> forward at flagship
    geometry (patch 14 / 329 tokens / depth 40 / head_dim 64 / 14->16
    bicubic regrid / 16 heads) must match the frozen torch-oracle
    activations at blocks 0/20/39, the final encoder tokens, and the
    generator output — torch-free at test time. Regenerate with
    scripts/make_parity_fixtures.py."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from make_parity_fixtures import TAPS, fixture_vit_cfg, run_jax

    path = Path(__file__).parent / "fixtures/parity_flagship_geom.npz"
    z = np.load(path)
    meta = json.loads(str(z["meta"]))
    assert meta["taps"] == list(TAPS)
    cfg = fixture_vit_cfg()
    assert cfg.num_prefix_tokens + cfg.num_patches == 329  # flagship S

    enc_j, taps_j, out_j = run_jax(
        [(k, tuple(s)) for k, s in meta["keys_shapes"]])
    tol = meta["tol"]
    for idx, i in enumerate(TAPS):
        np.testing.assert_allclose(taps_j[idx], z[f"tap{i}"],
                                   atol=tol["tap"], rtol=0)
    np.testing.assert_allclose(enc_j, z["enc"], atol=tol["enc"], rtol=0)
    np.testing.assert_allclose(out_j, z["out"], atol=tol["out"], rtol=0)


def test_unetr_geometry_golden_fixture():
    """Golden-fixture lock for the UNETR family (VERDICT r4 #10):
    deterministic torch-layout checkpoint -> unetr_from_torch -> UnetrViT
    forward at flagship ViT geometry (patch 14 / depth 40 / extract-layers
    linspace / nearest re-grid to the /16 grid / 312-bottleneck decoder /
    16 attention heads) must match the frozen torch-oracle output —
    torch-free at test time. Regenerate with
    scripts/make_parity_fixtures.py --only unetr."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from make_parity_fixtures import run_jax_unetr

    path = Path(__file__).parent / "fixtures/parity_unetr_geom.npz"
    z = np.load(path)
    meta = json.loads(str(z["meta"]))
    out_j = run_jax_unetr([(k, tuple(s)) for k, s in meta["keys_shapes"]])
    np.testing.assert_allclose(out_j, z["out"], atol=meta["tol"]["out"],
                               rtol=0)


def test_hybrid_geometry_golden_fixture():
    """Golden-fixture lock for the HEMIT-hybrid family (VERDICT r4 #10):
    deterministic torch-layout checkpoint -> hybrid_swint_from_torch ->
    HybridSwinT forward (production channel plan; window 4 so stage 0
    runs a real shifted-window block) must match the frozen
    timm-semantics torch-oracle output — torch-free at test time.
    Regenerate with scripts/make_parity_fixtures.py --only hybrid."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from make_parity_fixtures import run_jax_hybrid

    path = Path(__file__).parent / "fixtures/parity_hybrid_geom.npz"
    z = np.load(path)
    meta = json.loads(str(z["meta"]))
    out_j = run_jax_hybrid([(k, tuple(s)) for k, s in meta["keys_shapes"]])
    np.testing.assert_allclose(out_j, z["out"], atol=meta["tol"]["out"],
                               rtol=0)


def test_im2col_conv_matches_xla(rng):
    """BasicConv3x3 impl="im2col" (9-tap patches + one full-depth matmul)
    must match the plain 3x3 conv with the same params."""
    from mipheivit_tpu.models.mipheivit import BasicConv3x3

    for (h, w, c, k) in [(16, 16, 8, 4), (17, 9, 67, 32)]:
        x = jnp.array(rng.standard_normal((2, h, w, c)).astype(np.float32))
        ref_mod = BasicConv3x3(k, stride=1, impl="xla")
        vs = ref_mod.init(jax.random.PRNGKey(0), x, train=False)
        ref = np.asarray(ref_mod.apply(vs, x, train=False))
        out = np.asarray(BasicConv3x3(k, stride=1, impl="im2col")
                         .apply(vs, x, train=False))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_conv3x3_env_override(rng, monkeypatch):
    """MIPHEI_CONV3_IMPL steers 'auto' modules (profiling hook) without
    touching explicitly configured ones."""
    from mipheivit_tpu.models.mipheivit import BasicConv3x3

    x = jnp.array(rng.standard_normal((1, 8, 8, 6)).astype(np.float32))
    mod = BasicConv3x3(4, stride=1, impl="auto")
    vs = mod.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(mod.apply(vs, x, train=False))
    monkeypatch.setenv("MIPHEI_CONV3_IMPL", "im2col")
    out = np.asarray(mod.apply(vs, x, train=False))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
