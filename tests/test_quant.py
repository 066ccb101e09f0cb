"""Opt-in int8 W8A8 serving mode (ops/quant.py + quantize_encoder).

New TPU-native capability with no torch-reference counterpart: the v5e
MXU's 2x int8 rate halves the flagship's dominant matmul term. The bf16
path stays the default; these tests bound the quantization error and
prove the serving transform produces a runnable, accurate twin.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mipheivit_tpu.models import MipheiViT, ViTConfig
from mipheivit_tpu.ops.quant import int8_matmul, quantize_weight


def test_quantize_weight_roundtrip(rng):
    w = rng.standard_normal((64, 128)).astype(np.float32)
    w_i8, scale = quantize_weight(w)
    assert w_i8.dtype == np.int8 and scale.shape == (128,)
    deq = w_i8.astype(np.float32) * scale
    # per-channel symmetric int8: max error is half a quantization step
    step = scale[None, :]
    assert np.all(np.abs(deq - w) <= 0.5 * step + 1e-7)


def test_quantize_weight_stacked_scan_axis(rng):
    w = rng.standard_normal((5, 16, 32)).astype(np.float32)  # [L, K, N]
    w_i8, scale = quantize_weight(w)
    assert w_i8.shape == w.shape and scale.shape == (5, 32)
    deq = w_i8.astype(np.float32) * scale[:, None, :]
    assert np.max(np.abs(deq - w)) <= 0.5 * np.max(scale) + 1e-7


def test_int8_matmul_error_bound(rng):
    x = rng.standard_normal((8, 96)).astype(np.float32)
    w = (rng.standard_normal((96, 48)) * 0.05).astype(np.float32)
    b = rng.standard_normal(48).astype(np.float32)
    w_i8, scale = quantize_weight(w)
    got = np.asarray(int8_matmul(jnp.array(x), jnp.array(w_i8),
                                 jnp.array(scale), jnp.array(b)))
    ref = x @ w + b
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 0.02


def test_quantize_encoder_transform_and_forward(rng):
    """quantize_encoder on a tiny MipheiViT: int8 kernels + scales in the
    block tree, and the quantized forward tracks the float forward."""
    from mipheivit_tpu.infer.loading import quantize_encoder

    cfg = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                    num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                    no_embed_class=True, attn_impl="xla", remat=False,
                    lora_rank=0)
    model = MipheiViT(vit_cfg=cfg, out_chans=3)
    x = jnp.array(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(model.apply(v, x, train=False))

    qmodel, qv = quantize_encoder(model, v)
    blocks = qv["params"]["encoder"]["vit"]["blocks"]
    assert blocks["attn"]["qkv"]["kernel"].dtype == np.int8
    assert blocks["mlp"]["fc1"]["scale"].shape[-1] == 2 * 64
    # decoder untouched
    assert qv["params"]["decoder"] is v["params"]["decoder"]

    out = np.asarray(qmodel.apply(qv, x, train=False))
    assert out.shape == ref.shape
    # output codec range is [-0.9, 0.9]; W8A8 on a 2-block encoder stays
    # within a few quantization steps of the float forward
    err = np.abs(out - ref)
    assert np.median(err) < 0.02 and np.max(err) < 0.15
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995


def test_int8_wsi_serving_path(rng, tmp_path):
    """The --int8 serving surface end-to-end: a quantized generator drives
    the full stitched WSI pipeline and its uint8 output stays within a few
    codec steps of the bf16 path (run_inference.py --wsi --int8)."""
    from mipheivit_tpu.data.stats import Normalizer
    from mipheivit_tpu.infer import wsi_inference
    from mipheivit_tpu.infer.loading import quantize_encoder
    from mipheivit_tpu.slideio import TiffSlide, write_pyramid

    cfg = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                    num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                    no_embed_class=True, attn_impl="xla", remat=False,
                    lora_rank=0)
    model = MipheiViT(vit_cfg=cfg, out_chans=2)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    qmodel, qv = quantize_encoder(model, v)

    he = rng.integers(100, 255, (3, 96, 96)).astype(np.uint8)
    slide = str(tmp_path / "wsi.tiff")
    write_pyramid(slide, he, n_levels=2, tile_size=32)
    norm = Normalizer({"mean": [180.0] * 3, "std": [40.0] * 3}, "he")
    kwargs = dict(tile_size=32, overlap=8, batch_size=2, tissue_only=False,
                  n_pyramid_levels=2)
    out_f = wsi_inference(model, v, slide, str(tmp_path / "f.ome.tiff"),
                          ["CD31", "CD3e"], norm, **kwargs)
    out_q = wsi_inference(qmodel, qv, slide, str(tmp_path / "q.ome.tiff"),
                          ["CD31", "CD3e"], norm, **kwargs)
    tf_, tq = TiffSlide(out_f), TiffSlide(out_q)
    a = tf_.read_region((0, 0), 0, tf_.dimensions).astype(np.int16)
    b = tq.read_region((0, 0), 0, tq.dimensions).astype(np.int16)
    tf_.close(); tq.close()
    assert np.median(np.abs(a - b)) <= 1          # uint8 codec steps
    assert np.mean(np.abs(a - b) <= 10) > 0.99


def test_quantize_decoder_transform_and_per_marker_pearson(rng):
    """Full int8 serving mode (encoder + decoder fusion convs): the
    transformed tree carries int8 fusion kernels, the heads stay float,
    and every marker's output correlates with the bf16 forward at
    Pearson >= 0.995 (VERDICT r3 #8 accuracy gate beyond the codec-step
    bound)."""
    from mipheivit_tpu.infer.loading import quantize_decoder, quantize_encoder

    cfg = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                    num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                    no_embed_class=True, attn_impl="xla", remat=False,
                    lora_rank=0)
    model = MipheiViT(vit_cfg=cfg, out_chans=4)
    x = jnp.array(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(model.apply(v, x, train=False))

    qmodel, qv = quantize_encoder(model, v)
    qmodel, qv = quantize_decoder(qmodel, qv)
    for i in range(4):
        blk = qv["params"]["decoder"][f"fusion_blks_{i}"]["conv"]["conv"]
        assert blk["kernel"].dtype == np.int8
        assert blk["scale"].dtype == np.float32
    # heads + convstream stay float
    heads = qv["params"]["decoder"]["segmentation_head_0"]["conv"]
    assert heads["kernel"].dtype != np.int8
    cs = qv["params"]["decoder"]["convstream"]["convs_0"]["conv"]
    assert cs["kernel"].dtype != np.int8

    out = np.asarray(qmodel.apply(qv, x, train=False))
    assert out.shape == ref.shape
    for m in range(out.shape[-1]):
        corr = np.corrcoef(out[..., m].ravel(), ref[..., m].ravel())[0, 1]
        assert corr > 0.995, (m, corr)
    assert np.median(np.abs(out - ref)) < 0.02


def test_int8_with_seq_shard_serving(rng):
    """Combined serving modes: W8A8 quantization + sequence-sharded
    attention on a dp2 x sp4 mesh tracks the float seq-shard forward."""
    from mipheivit_tpu.infer.loading import quantize_decoder, quantize_encoder
    from mipheivit_tpu.parallel import make_mesh
    from mipheivit_tpu.parallel.seq import seq_shard_scope

    base = dict(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                num_heads=2, mlp_hidden_dim=64, reg_tokens=0,
                class_token=False, no_embed_class=True, remat=False,
                lora_rank=0)
    mesh = make_mesh(n_data=2, n_model=4)
    model = MipheiViT(vit_cfg=ViTConfig(attn_impl="seq_shard", **base),
                      out_chans=2)
    x = jnp.array(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    with seq_shard_scope(mesh):
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        ref = np.asarray(model.apply(v, x, train=False))
        qmodel, qv = quantize_decoder(*quantize_encoder(model, v))
        assert qmodel.vit_cfg.attn_impl == "seq_shard"
        out = np.asarray(jax.jit(
            lambda v, x: qmodel.apply(v, x, train=False))(qv, x))
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.99
