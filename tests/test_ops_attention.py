"""Flash attention kernel vs plain softmax attention (and torch SDPA)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mipheivit_tpu.ops import dot_product_attention
from mipheivit_tpu.ops.attention import _attn_reference


def _mk(rng, b=2, h=3, s=329, d=64, dtype=np.float32):
    q = rng.standard_normal((b, h, s, d)).astype(dtype)
    k = rng.standard_normal((b, h, s, d)).astype(dtype)
    v = rng.standard_normal((b, h, s, d)).astype(dtype)
    return q, k, v


def test_xla_matches_torch_sdpa(rng):
    q, k, v = _mk(rng, s=37)
    ours = np.asarray(dot_product_attention(jnp.array(q), jnp.array(k), jnp.array(v), impl="xla"))
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("s", [128, 329, 640])
def test_flash_matches_reference(rng, s):
    # On CPU the pallas kernel runs in interpret mode (slow but exact-path).
    q, k, v = _mk(rng, b=1, h=2, s=s)
    out_flash = np.asarray(
        dot_product_attention(jnp.array(q), jnp.array(k), jnp.array(v), impl="flash")
    )
    out_ref = np.asarray(_attn_reference(jnp.array(q), jnp.array(k), jnp.array(v), s))
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5, rtol=1e-4)


def test_flash_backward_matches_reference(rng):
    q, k, v = _mk(rng, b=1, h=1, s=160, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, impl="flash") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_attn_reference(q, k, v, q.shape[-2]) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(jnp.array(q), jnp.array(k), jnp.array(v))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(jnp.array(q), jnp.array(k), jnp.array(v))
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_bshd_kernel_matches_xla(rng):
    """Transpose-free [B,S,H*D] kernel (interpret mode on CPU) vs the
    explicit-head XLA path."""
    from mipheivit_tpu.ops.attention import attention_bshd

    b, h, s, d = 2, 4, 329, 32
    q = rng.standard_normal((b, s, h * d)).astype(np.float32)
    k = rng.standard_normal((b, s, h * d)).astype(np.float32)
    v = rng.standard_normal((b, s, h * d)).astype(np.float32)
    out = np.asarray(attention_bshd(
        jnp.array(q), jnp.array(k), jnp.array(v), h, impl="flash_interpret"))
    ref = np.asarray(attention_bshd(
        jnp.array(q), jnp.array(k), jnp.array(v), h, impl="xla"))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_bshd_kernel_grads_match_xla(rng):
    from mipheivit_tpu.ops.attention import attention_bshd

    b, h, s, d = 1, 2, 50, 16
    q = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)

    def f(impl):
        return jax.grad(
            lambda q, k, v: (attention_bshd(q, k, v, h, impl=impl) ** 2).sum(),
            argnums=(0, 1, 2))(q, k, v)

    for a, b_ in zip(f("flash_interpret"), f("xla")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_merge_lora_exact(rng):
    """Folding LoRA into qkv weights reproduces the unmerged forward."""
    from mipheivit_tpu.infer.loading import merge_lora
    from mipheivit_tpu.models import MipheiViT, ViTConfig

    cfg = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=64, depth=2,
                    num_heads=2, mlp_hidden_dim=128, reg_tokens=4,
                    no_embed_class=True, lora_rank=4, attn_impl="xla",
                    remat=False)
    m = MipheiViT(vit_cfg=cfg, out_chans=5)
    x = jnp.array(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # LoRA B init is zeros; perturb so the merge is load-bearing
    v = jax.tree_util.tree_map_with_path(
        lambda p, leaf: leaf + 0.02
        if str(getattr(p[-1], "key", "")) == "B"
        and any("lora" in str(getattr(kk, "key", "")) for kk in p) else leaf,
        v)
    ref = m.apply(v, x, train=False)
    m2, v2 = merge_lora(m, v)
    out = m2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert not any(
        "lora" in str(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(v2["params"]))


def test_flash_long_backward_pallas_matches_reference(rng):
    """Long-sequence (S > 512) backward runs the Pallas block-recompute
    kernels (dK/dV + dQ from the saved LSE) — gradients must match the
    XLA reference, including an unaligned true length under padding."""
    from mipheivit_tpu.ops.attention import _MAX_BLOCK

    s = _MAX_BLOCK + 130                      # unaligned -> internal padding
    q, k, v = _mk(rng, b=1, h=2, s=s, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, impl="flash") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_attn_reference(q, k, v, q.shape[-2]) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(
        jnp.array(q), jnp.array(k), jnp.array(v))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.array(q), jnp.array(k), jnp.array(v))
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_qkv_fused_kernel_matches_split(rng):
    """attention_qkv (in-place section reads off one fused buffer) must be
    bit-comparable to splitting + attention_bshd."""
    from mipheivit_tpu.ops.attention import attention_bshd, attention_qkv

    b, h, s, d = 2, 4, 329, 32
    qkv = rng.standard_normal((b, s, 3 * h * d)).astype(np.float32)
    q, k, v = np.split(qkv, 3, axis=-1)
    out = np.asarray(attention_qkv(jnp.array(qkv), h, impl="flash_interpret"))
    ref = np.asarray(attention_bshd(
        jnp.array(q), jnp.array(k), jnp.array(v), h, impl="flash_interpret"))
    np.testing.assert_array_equal(out, ref)
    xla = np.asarray(attention_bshd(
        jnp.array(q), jnp.array(k), jnp.array(v), h, impl="xla"))
    np.testing.assert_allclose(out, xla, atol=2e-5, rtol=1e-4)


def test_qkv_fused_kernel_grads_match_xla(rng):
    from mipheivit_tpu.ops.attention import attention_qkv

    b, h, s, d = 1, 2, 50, 16
    qkv = jnp.array(rng.standard_normal((b, s, 3 * h * d)), jnp.float32)

    def f(impl):
        return jax.grad(
            lambda t: (attention_qkv(t, h, impl=impl) ** 2).sum())(qkv)

    np.testing.assert_allclose(
        np.asarray(f("flash_interpret")), np.asarray(f("xla")),
        atol=1e-4, rtol=1e-4)


def test_qkv_small_head_width_fallback(rng):
    """hpb*d below a 128-lane multiple cannot use the fused-qkv in-place
    blocked specs (Mosaic block-width rule); attention_qkv must route to
    the split path and stay correct (regression: tiny d=16 models crashed
    the TPU compile inside wsi_inference)."""
    from mipheivit_tpu.ops.attention import attention_bshd, attention_qkv

    b, h, s, d = 2, 4, 258, 16          # h*d = 64: not a 128 multiple
    qkv = rng.standard_normal((b, s, 3 * h * d)).astype(np.float32)
    out = np.asarray(attention_qkv(jnp.array(qkv), h, impl="flash"))
    q, k, v = np.split(qkv, 3, axis=-1)
    ref = np.asarray(attention_bshd(
        jnp.array(q), jnp.array(k), jnp.array(v), h, impl="xla"))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["staged", "paired_bd"])
def test_bshd_kernel_variants_match_production(rng, variant, monkeypatch):
    """The r4 sweep variants (staged emission order; block-diagonal
    head-pair packing) are pure scheduling experiments — numerics must
    equal the production interleaved kernel."""
    from mipheivit_tpu.ops.attention import attention_qkv

    monkeypatch.setenv("MIPHEI_ATTN_VARIANT", variant)
    b, s, h, d = 2, 40, 4, 16
    qkv = rng.standard_normal((b, s, 3 * h * d)).astype(np.float32)
    got = np.asarray(attention_qkv(jnp.array(qkv), h,
                                   impl="flash_interpret"))
    monkeypatch.setenv("MIPHEI_ATTN_VARIANT", "interleaved")
    want = np.asarray(attention_qkv(jnp.array(qkv), h,
                                    impl="flash_interpret"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
