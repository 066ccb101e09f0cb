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
