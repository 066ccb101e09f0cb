"""Sequence-sharded whole-region attention (SURVEY §5; VERDICT r2 #8 opt).

Token axis sharded over the mesh's ``model`` axis: each shard all-gathers
k/v and runs the rectangular flash kernel on its local q rows
(parallel/seq.py). Verified on the virtual 8-device CPU mesh against the
unsharded XLA reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mipheivit_tpu.models.vit import ViTConfig, VisionTransformer
from mipheivit_tpu.parallel import make_mesh
from mipheivit_tpu.parallel.seq import seq_shard_scope, seq_sharded_attention


def test_flash_cross_attention_rectangular(rng):
    """Local-q (Sq != Sk) flash matches plain softmax attention."""
    from mipheivit_tpu.ops.attention import flash_cross_attention

    b, h, sq, sk, d = 1, 2, 300, 700, 32
    q = jnp.array(rng.standard_normal((b, h, sq, d)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, h, sk, d)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, h, sk, d)), jnp.float32)
    out = flash_cross_attention(q, k, v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_cross_attention_grads_match_reference(rng):
    """Rectangular backward (recompute-from-LSE) vs autodiff through the
    plain softmax reference, including key masking."""
    from mipheivit_tpu.ops.attention import flash_cross_attention

    b, h, sq, sk, d = 1, 2, 130, 300, 16
    seq_len_k = 290                               # mask the last 10 keys
    q = jnp.array(rng.standard_normal((b, h, sq, d)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, h, sk, d)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, h, sk, d)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_cross_attention(q, k, v, seq_len_k) ** 2)

    def loss_ref(q, k, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        logits = jnp.where(jnp.arange(sk)[None, None, None, :] < seq_len_k,
                           logits, -1e30)
        out = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


def test_seq_sharded_attention_grads_match_unsharded(rng):
    """Whole-region TRAINING over the mesh: grads through shard_map (the
    k/v all-gather transposes to a dK/dV reduce-scatter) equal the
    unsharded gradients."""
    from mipheivit_tpu.ops.attention import attention_qkv

    mesh = make_mesh(n_data=2, n_model=4)
    b, h, s, d = 1, 2, 512, 32
    qkv = jnp.array(rng.standard_normal((b, s, 3 * h * d)), jnp.float32)

    g_shard = jax.grad(lambda t: jnp.sum(
        seq_sharded_attention(t, num_heads=h, mesh=mesh) ** 2))(qkv)
    g_ref = jax.grad(lambda t: jnp.sum(
        attention_qkv(t, h, impl="xla") ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-3)


def test_seq_sharded_attention_matches_unsharded(rng):
    from mipheivit_tpu.ops.attention import attention_qkv

    mesh = make_mesh(n_data=2, n_model=4)
    b, h, s, d = 2, 2, 1024, 32
    qkv = jnp.array(rng.standard_normal((b, s, 3 * h * d)), jnp.float32)
    out = seq_sharded_attention(qkv, num_heads=h, mesh=mesh)
    ref = attention_qkv(qkv, h, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_seq_sharded_attention_pads_nondivisible_s(rng):
    """S=1001 on a 4-way axis: global zero-pad + key masking must be exact
    (the flagship's 5334 region tokens need this on 4/8-chip meshes)."""
    from mipheivit_tpu.ops.attention import attention_qkv

    mesh = make_mesh(n_data=2, n_model=4)
    b, h, s, d = 1, 2, 1001, 32
    qkv = jnp.array(rng.standard_normal((b, s, 3 * h * d)), jnp.float32)
    out = seq_sharded_attention(qkv, num_heads=h, mesh=mesh)
    assert out.shape == (b, s, h * d)
    ref = attention_qkv(qkv, h, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_vit_seq_shard_whole_region_matches_xla(rng):
    """Full ViT forward at whole-region token count (512^2 px -> 1024
    tokens) with attn_impl="seq_shard" on a dp2 x sp4 mesh equals the
    single-logical-device XLA forward."""
    mesh = make_mesh(n_data=2, n_model=4)
    base = dict(img_size=(512, 512), patch_size=16, embed_dim=64, depth=2,
                num_heads=2, mlp_hidden_dim=128, reg_tokens=0,
                class_token=False, no_embed_class=True, remat=False,
                lora_rank=0)
    vit_x = VisionTransformer(ViTConfig(attn_impl="xla", **base))
    vit_s = VisionTransformer(ViTConfig(attn_impl="seq_shard", **base))

    x = jnp.array(rng.standard_normal((2, 512, 512, 3)), jnp.float32)
    v = vit_x.init(jax.random.PRNGKey(0), x)
    ref = vit_x.apply(v, x)

    with seq_shard_scope(mesh):
        out = jax.jit(vit_s.apply)(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4, rtol=1e-3)


def test_full_generator_seq_shard_matches_xla(rng):
    """Whole generator (encoder + detail-capture decoder) with seq-sharded
    attention: GSPMD handles the token->grid reshape and the decoder convs
    around the shard_map'd attention; output equals the unsharded path."""
    from mipheivit_tpu.models import MipheiViT

    mesh = make_mesh(n_data=2, n_model=4)
    base = dict(img_size=(256, 256), patch_size=16, embed_dim=64, depth=2,
                num_heads=2, mlp_hidden_dim=128, reg_tokens=0,
                class_token=False, no_embed_class=True, remat=False,
                lora_rank=0)
    m_x = MipheiViT(vit_cfg=ViTConfig(attn_impl="xla", **base), out_chans=2)
    m_s = MipheiViT(vit_cfg=ViTConfig(attn_impl="seq_shard", **base),
                    out_chans=2)
    x = jnp.array(rng.standard_normal((1, 256, 256, 3)), jnp.float32)
    v = m_x.init(jax.random.PRNGKey(0), x, train=False)
    ref = m_x.apply(v, x, train=False)
    with seq_shard_scope(mesh):
        out = jax.jit(lambda v, x: m_s.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4, rtol=1e-3)


def test_wsi_serving_seq_shard_matches_single(rng, tmp_path):
    """run_inference --wsi --seq_shard path: region-tiled stitched serving
    with the token axis sharded over the mesh equals the unsharded stitch
    (within the uint8 output codec)."""
    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer import wsi_inference
    from mipheivit_tpu.models import MipheiViT
    from mipheivit_tpu.slideio import TiffSlide, write_pyramid

    mesh = make_mesh(n_data=2, n_model=4)
    base = dict(img_size=(64, 64), patch_size=4, embed_dim=32, depth=2,
                num_heads=2, mlp_hidden_dim=64, reg_tokens=0,
                class_token=False, no_embed_class=True, remat=False,
                lora_rank=0)                      # 16x16 = 256 tokens
    m_x = MipheiViT(vit_cfg=ViTConfig(attn_impl="xla", **base), out_chans=2)
    m_s = MipheiViT(vit_cfg=ViTConfig(attn_impl="seq_shard", **base),
                    out_chans=2)
    v = m_x.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                 train=False)

    he = rng.integers(100, 255, (3, 128, 128)).astype(np.uint8)
    slide = str(tmp_path / "wsi.tiff")
    write_pyramid(slide, he, n_levels=2, tile_size=64)
    norm = Normalizer({"mean": [180.0] * 3, "std": [40.0] * 3}, "he")
    kwargs = dict(tile_size=64, overlap=16, batch_size=2, tissue_only=False,
                  n_pyramid_levels=2)
    out_x = wsi_inference(m_x, v, slide, str(tmp_path / "x.ome.tiff"),
                          ["CD31", "CD3e"], norm, **kwargs)
    out_s = wsi_inference(m_s, v, slide, str(tmp_path / "s.ome.tiff"),
                          ["CD31", "CD3e"], norm, seq_shard_mesh=mesh,
                          **kwargs)
    tx, ts_ = TiffSlide(out_x), TiffSlide(out_s)
    a = tx.read_region((0, 0), 0, tx.dimensions).astype(np.int16)
    b = ts_.read_region((0, 0), 0, ts_.dimensions).astype(np.int16)
    tx.close(); ts_.close()
    assert np.max(np.abs(a - b)) <= 1             # one uint8 codec step


def test_seq_shard_requires_scope():
    vit = VisionTransformer(ViTConfig(
        img_size=(64, 64), patch_size=16, embed_dim=32, depth=1,
        num_heads=2, mlp_hidden_dim=64, reg_tokens=0, class_token=False,
        remat=False, attn_impl="seq_shard"))
    with pytest.raises(RuntimeError, match="seq_shard_scope"):
        vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
