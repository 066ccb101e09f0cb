"""MIPHEI-ViT generator: ViT foundation encoder + detail-capture decoder.

TPU-native rebuild of the reference's ViTMatte-style architecture
(reference: src/generators/mipheivit.py):

  * ``Encoder`` runs the ViT, drops prefix tokens, re-grids tokens to an
    NHWC feature map and bicubically re-samples the patch-14 grid onto the
    /16 grid (reference lines 144-163) via the torch-parity matmul resize.
  * ``DetailCapture`` fuses a 3-level strided-conv stream over the raw RGB
    with 4 upsample+concat+conv fusion blocks, then applies one
    attention-gated head per output marker with Tanh (reference lines
    166-220, and src/generators/unet.py:407-438 for the heads).

Everything is NHWC. The per-marker heads are evaluated as a single
vmapped/stacked computation — 16 tiny convs become one batched conv on the
MXU instead of 16 kernel launches.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .vit import ViTConfig, VisionTransformer
from ..ops import seg_heads
from ..ops.resize import resize_bicubic, upsample2x_bilinear_nhwc

# pix2pix-style init used across the reference decoder
# (reference: src/generators/unet.py:522-531)
conv_init = nn.initializers.normal(0.02)
bn_scale_init = lambda key, shape, dtype=jnp.float32: (
    1.0 + 0.02 * jax.random.normal(key, shape, dtype)
)


class _PhasePackedConv(nn.Module):
    """3x3/stride-1 conv evaluated as one 4x4/stride-2 conv over 4x packed
    output phases + depth-to-space. Owns the canonical ``kernel`` param
    ([3,3,C,K], same path as ``nn.Conv(name="conv")``) so checkpoints are
    layout-identical; the 4x4 phase kernel is built from it at call time."""

    out_chans: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.out_chans
        kernel = self.param("kernel", conv_init, (3, 3, c, k))
        k3 = kernel.astype(x.dtype)
        w4 = jnp.zeros((4, 4, c, 2, 2, k), x.dtype)
        for u in (0, 1):
            for v in (0, 1):
                # output phase (u, v) sees the 3x3 taps shifted by (u, v)
                w4 = w4.at[u:u + 3, v:v + 3, :, u, v, :].add(k3)
        w4 = w4.reshape(4, 4, c, 4 * k)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp, w4, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, h // 2, w // 2, 2, 2, k)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, k)
        return y


def _conv3x3_env_impl() -> str:
    """Profiling override for the fusion convs (MIPHEI_CONV3_IMPL=
    xla|phase_packed|im2col); empty = each module's configured impl."""
    import os

    return os.environ.get("MIPHEI_CONV3_IMPL", "")


def _im2col_patches(x):
    """9-tap im2col rows for a 3x3/stride-1 conv: [B*H*W, 9C], tap-major
    (dy, dx) row-major then channel — the SAME flattening order as
    ``flatten_conv3x3_kernel``. Both im2col conv modules and
    ``infer.loading.quantize_decoder`` depend on this single contract."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(3) for dx in range(3)]
    return jnp.concatenate(taps, axis=-1).reshape(b * h * w, 9 * c)


def flatten_conv3x3_kernel(kernel):
    """(3, 3, C, K) conv kernel -> [9C, K] matmul weight matching
    ``_im2col_patches``'s (dy, dx, c) row order (plain row-major
    reshape)."""
    kh, kw, c, k = kernel.shape
    return kernel.reshape(kh * kw * c, k)


class _Im2ColConv(nn.Module):
    """3x3/stride-1 conv as 9-tap im2col + ONE [BHW, 9C] x [9C, K] matmul
    (VERDICT r3 #4): the small-channel fusion convs run at ~22% MXU under
    XLA's conv (out 64/32 lanes); the im2col matmul has full contraction
    depth (9C = 2016/1008 at fusion2/3) at the cost of materializing the
    9x patches in HBM. Same param path/shape as nn.Conv(name="conv")."""

    out_chans: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param("kernel", conv_init, (3, 3, c, self.out_chans))
        wmat = flatten_conv3x3_kernel(kernel).astype(x.dtype)
        y = jax.lax.dot_general(
            _im2col_patches(x), wmat,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return y.reshape(b, h, w, self.out_chans).astype(x.dtype)


class _Int8Im2ColConv(nn.Module):
    """W8A8 serving twin of ``_Im2ColConv``: int8 kernel (3,3,C,K) +
    per-output-channel f32 scale, patches dynamically quantized per row —
    the conv rides the MXU's 2x int8 path AND the 9x patch HBM traffic
    halves. Produced by ``infer.loading.quantize_decoder``."""

    out_chans: int

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_conv3x3

        b, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.zeros,
                            (3, 3, c, self.out_chans), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.out_chans,), jnp.float32)
        return int8_conv3x3(x, flatten_conv3x3_kernel(kernel), scale)


class BasicConv3x3(nn.Module):
    """conv3x3(no bias) + BN + ReLU (reference: mipheivit.py:20-41).

    ``impl="phase_packed"`` (measured dead end, kept for the record): all
    four stride-2 output phases in ONE 4x4/stride-2 conv with 4*out_chans
    output channels + depth-to-space — exact up to f32 re-association, and
    meant to fix the <15% output-lane efficiency of the small-channel
    fusion convs. Measured on v5e at B=64 it is *slower* than XLA's conv
    (fusion2 8.3 vs 7.1 ms, fusion3 12.2 vs 10.1): the 1.78x kernel-support
    FLOPs plus the depth-to-space relayout outweigh the lane win, so
    "auto" always takes the plain conv.

    ``impl="im2col"`` (r4 candidate): one full-depth matmul over 9-tap
    patches — trades ~2x HBM traffic for MXU efficiency; same param tree.
    """

    out_chans: int
    stride: int = 2
    impl: str = "auto"   # "auto" (= xla) | "xla" | "phase_packed" | "im2col"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        impl = self.impl
        if impl == "auto" and _conv3x3_env_impl():
            impl = _conv3x3_env_impl()
        use_pp = (
            self.stride == 1 and self.out_chans < 128
            and h % 2 == 0 and w % 2 == 0
            and impl == "phase_packed"
        )
        use_i2c = self.stride == 1 and impl == "im2col"
        use_i8 = self.stride == 1 and impl == "int8_im2col"
        if use_pp:
            x = _PhasePackedConv(self.out_chans, name="conv")(x)
        elif use_i2c:
            x = _Im2ColConv(self.out_chans, name="conv")(x)
        elif use_i8:
            x = _Int8Im2ColConv(self.out_chans, name="conv")(x)
        else:
            x = nn.Conv(
                self.out_chans, (3, 3), strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)), use_bias=False,
                kernel_init=conv_init, name="conv", dtype=x.dtype,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            scale_init=bn_scale_init, name="bn", dtype=x.dtype,
        )(x)
        return nn.relu(x)


class ConvStream(nn.Module):
    """Detail stream D1..D3 at strides 2/4/8 (reference: mipheivit.py:44-73)."""

    out_chans: Sequence[int] = (48, 96, 192)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = [x]  # D0 = raw input
        for i, ch in enumerate(self.out_chans):
            x = BasicConv3x3(ch, stride=2, name=f"convs_{i}")(x, train)
            feats.append(x)
        return feats


class FusionBlock(nn.Module):
    """up(x2, bilinear) -> concat(detail, up) -> conv3x3-BN-ReLU
    (reference: mipheivit.py:76-93; concat order [D, F_up])."""

    out_chans: int
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, detail, train: bool = False):
        up = upsample2x_bilinear_nhwc(x)
        out = jnp.concatenate([detail, up], axis=-1)
        return BasicConv3x3(self.out_chans, stride=1, impl=self.conv_impl,
                            name="conv")(out, train)


class AttentionGate(nn.Module):
    """Sigmoid spatial gate: x * psi(x)
    (reference: src/generators/unet.py:407-422)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        g = nn.Conv(c // 2, (1, 1), use_bias=True, kernel_init=conv_init,
                    name="psi_conv1", dtype=x.dtype)(x)
        g = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=bn_scale_init,
                         name="psi_bn", dtype=x.dtype)(g)
        g = nn.relu(g)
        g = nn.Conv(1, (1, 1), use_bias=True, kernel_init=conv_init,
                    name="psi_conv2", dtype=x.dtype)(g)
        return x * nn.sigmoid(g)


class SegmentationHead(nn.Module):
    """Attention gate + conv3x3 + activation (reference: unet.py:425-438)."""

    use_attention: bool = True
    activation: str = "tanh"
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_attention:
            x = AttentionGate(name="attention")(x, train)
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True,
                    kernel_init=conv_init, name="conv", dtype=x.dtype)(x)
        if self.activation == "tanh":
            x = jnp.tanh(x)
        elif self.activation == "sigmoid":
            x = nn.sigmoid(x)
        return x


class _BNVars(nn.Module):
    """Declares BatchNorm parameters/stats under this module's scope and
    returns them raw, so the caller can fold them (Pallas path) or apply
    them manually (XLA path) while checkpoints keep the ``psi_bn/{scale,
    bias}`` + ``batch_stats`` layout of a real ``nn.BatchNorm``."""

    feats: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", bn_scale_init, (self.feats,))
        bias = self.param("bias", nn.initializers.zeros, (self.feats,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.feats,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.feats,), jnp.float32))
        return scale, bias, mean, var


class BatchedSegHeads(nn.Module):
    """All K attention-gated heads in one fused pass.

    Mathematically identical to K independent ``SegmentationHead``s but
    restructured for the MXU/HBM: the K psi gates become one 1x1 matmul +
    per-channel BN + one grouped 1x1; the K final 3x3 convs use the
    decomposition ``y_k(p) = sum_D m(p+D)[D,k] * g_k(p+D)`` where ``m`` is a
    single [BHW, C] x [C, 9K] matmul and the 9 taps are shifted
    multiply-adds — one pass over the feature map instead of K.

    Param layout: stacked along a leading K axis, converted from/to the
    canonical per-head layout by ``stack_head_params`` (checkpoints stay in
    the reference layout).
    """

    out_chans: int
    activation: str = "tanh"
    impl: str = "auto"      # "auto" | "xla" | "pallas" | "pallas_interpret"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k = self.out_chans
        c2 = c // 2
        eps = 1e-5

        w1 = self.param("psi_conv1_kernel", conv_init, (k, 1, 1, c, c2))
        b1 = self.param("psi_conv1_bias", nn.initializers.zeros, (k, c2))
        w2 = self.param("psi_conv2_kernel", conv_init, (k, 1, 1, c2, 1))
        b2 = self.param("psi_conv2_bias", nn.initializers.zeros, (k, 1))
        wf = self.param("conv_kernel", conv_init, (k, 3, 3, c, 1))
        bf = self.param("conv_bias", nn.initializers.zeros, (k, 1))
        scale, bias, ra_mean, ra_var = _BNVars(k * c2, name="psi_bn")()
        # tap-major [C, 9K] matrix of the K final 3x3 convs
        wm = wf[:, :, :, :, 0].transpose(3, 1, 2, 0).reshape(c, 9 * k)

        # NOTE: measured on v5e at bench shape, the Pallas fused kernel is
        # 2.5x SLOWER than the XLA path (25.3 vs 10.0 ms at B=64): the nine
        # (dy, dx) tap slices are sublane/lane-misaligned in the [rows, W,
        # 9K] layout and Mosaic inserts a relayout per tap. Kept behind
        # impl="pallas" for future layout work; "auto" stays on XLA.
        use_pallas = (
            not train and seg_heads.supported(h, w)
            and self.impl in ("pallas", "pallas_interpret")
        )
        if use_pallas:
            # whole chain in one VMEM-resident Pallas pass; BN folded into
            # the psi-conv1 weights in f32 (ops/seg_heads.py)
            mul = jax.lax.rsqrt(ra_var.value + eps) * scale
            w1eff = (w1[:, 0, 0].transpose(1, 0, 2).reshape(c, k * c2)
                     * mul[None, :])
            b1eff = (b1.reshape(k * c2) - ra_mean.value) * mul + bias
            w2v = w2[:, 0, 0, :, 0]                           # [K, C2]
            w2bd = (w2v[:, :, None] * jnp.eye(k, dtype=w2v.dtype)[:, None, :]
                    ).reshape(k * c2, k)
            return seg_heads.fused_seg_heads(
                x, w1eff, b1eff, w2bd, b2[:, 0], wm, bf[:, 0],
                activation=self.activation,
                interpret=self.impl == "pallas_interpret")

        g = jnp.einsum("bhwc,kcd->bhwkd", x,
                       w1[:, 0, 0].astype(x.dtype)) + b1.astype(x.dtype)
        g = g.reshape(b, h, w, k * c2)
        # manual BatchNorm (flax-parity math; variables live under psi_bn)
        if train:
            gf = g.astype(jnp.float32)
            bmean = jnp.mean(gf, axis=(0, 1, 2))
            bvar = jnp.maximum(
                jnp.mean(gf * gf, axis=(0, 1, 2)) - bmean * bmean, 0.0)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * bmean
                ra_var.value = 0.9 * ra_var.value + 0.1 * bvar
            mean_, var_ = bmean, bvar
        else:
            mean_, var_ = ra_mean.value, ra_var.value
        g = ((g - mean_) * (jax.lax.rsqrt(var_ + eps) * scale)
             + bias).astype(x.dtype)
        g = nn.relu(g).reshape(b, h, w, k, c2)
        gate = nn.sigmoid(
            jnp.einsum("bhwkd,kd->bhwk", g, w2[:, 0, 0, :, 0].astype(x.dtype))
            + b2[:, 0].astype(x.dtype))                       # [B,H,W,K]

        # m[..., D, k] = sum_c W_k[D, c] x_c   (one matmul over 9K outputs).
        # Padding x BEFORE the matmul (1% extra rows) lets the 9 shifted
        # tap contributions collapse into one stack+sum fusion over slices
        # of m — no [B,H,W,9,K] gated intermediate, no separate pad pass
        # (saves ~2.5 GB of HBM traffic per B=64 batch at 256 px).
        x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        m = (x_pad.reshape(-1, c) @ wm.astype(x.dtype)).reshape(
            b, h + 2, w + 2, 9, k)
        gate_pad = jnp.pad(gate, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [m[:, dy:dy + h, dx:dx + w, dy * 3 + dx]
                * gate_pad[:, dy:dy + h, dx:dx + w]
                for dy in range(3) for dx in range(3)]
        out = jnp.sum(jnp.stack(taps, axis=-1), axis=-1)
        out = out + bf[:, 0].astype(x.dtype)
        if self.activation == "tanh":
            out = jnp.tanh(out)
        elif self.activation == "sigmoid":
            out = nn.sigmoid(out)
        return out


def stack_head_params(decoder_params: dict, decoder_stats: dict,
                      out_chans: int):
    """Canonical per-head params -> BatchedSegHeads stacked layout."""
    import numpy as _np

    heads_p = [decoder_params[f"segmentation_head_{i}"]
               for i in range(out_chans)]
    heads_s = [decoder_stats[f"segmentation_head_{i}"]
               for i in range(out_chans)]
    params = {
        "psi_conv1_kernel": _np.stack(
            [_np.asarray(p["attention"]["psi_conv1"]["kernel"]) for p in heads_p]),
        "psi_conv1_bias": _np.stack(
            [_np.asarray(p["attention"]["psi_conv1"]["bias"]) for p in heads_p]),
        "psi_conv2_kernel": _np.stack(
            [_np.asarray(p["attention"]["psi_conv2"]["kernel"]) for p in heads_p]),
        "psi_conv2_bias": _np.stack(
            [_np.asarray(p["attention"]["psi_conv2"]["bias"]) for p in heads_p]),
        "conv_kernel": _np.stack(
            [_np.asarray(p["conv"]["kernel"]) for p in heads_p]),
        "conv_bias": _np.stack(
            [_np.asarray(p["conv"]["bias"]) for p in heads_p]),
        "psi_bn": {
            "scale": _np.concatenate(
                [_np.asarray(p["attention"]["psi_bn"]["scale"]) for p in heads_p]),
            "bias": _np.concatenate(
                [_np.asarray(p["attention"]["psi_bn"]["bias"]) for p in heads_p]),
        },
    }
    stats = {"psi_bn": {
        "mean": _np.concatenate(
            [_np.asarray(s["attention"]["psi_bn"]["mean"]) for s in heads_s]),
        "var": _np.concatenate(
            [_np.asarray(s["attention"]["psi_bn"]["var"]) for s in heads_s]),
    }}
    return params, stats


class DetailCapture(nn.Module):
    """ConvStream + 4 fusion blocks + per-marker heads
    (reference: mipheivit.py:166-220). ``fast_heads`` switches the K head
    chains to the fused ``BatchedSegHeads`` (different param layout;
    convert with ``stack_head_params``)."""

    out_chans: int = 16
    convstream_out: Sequence[int] = (48, 96, 192)
    fusion_out: Sequence[int] = (256, 128, 64, 32)
    use_attention: bool = True
    activation: str = "tanh"
    fast_heads: bool = False
    conv_impl: str = "auto"   # fusion convs: "auto"|"xla"|"im2col"|int8 twin

    @nn.compact
    def __call__(self, features, images, train: bool = False):
        details = ConvStream(self.convstream_out, name="convstream")(images, train)
        x = features
        n = len(self.fusion_out)
        for i, ch in enumerate(self.fusion_out):
            x = FusionBlock(ch, conv_impl=self.conv_impl,
                            name=f"fusion_blks_{i}")(
                x, details[n - i - 1], train
            )
        if self.fast_heads:
            return BatchedSegHeads(self.out_chans, self.activation,
                                   name="heads")(x, train)
        heads = [
            SegmentationHead(
                self.use_attention, self.activation,
                name=f"segmentation_head_{idx}",
            )(x, train)
            for idx in range(self.out_chans)
        ]
        return jnp.concatenate(heads, axis=-1)


class Encoder(nn.Module):
    """ViT wrapper: tokens -> NHWC grid -> bicubic re-grid to /16
    (reference: mipheivit.py:124-163)."""

    vit_cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.vit_cfg
        tokens = VisionTransformer(cfg, name="vit")(x)
        tokens = tokens[:, cfg.num_prefix_tokens:]
        b = tokens.shape[0]
        gh, gw = cfg.grid_size
        feats = tokens.reshape(b, gh, gw, cfg.embed_dim)
        target = (cfg.img_size[0] // 16, cfg.img_size[1] // 16)
        if target != (gh, gw):
            # channels-last separable bicubic (torch F.interpolate parity)
            feats = feats.transpose(0, 3, 1, 2)
            feats = resize_bicubic(feats, target)
            feats = feats.transpose(0, 2, 3, 1)
        return feats


class MipheiViT(nn.Module):
    """Full generator. Input [B,H,W,3] normalized H&E; output [B,H,W,C] in
    (-1, 1) (Tanh heads). H, W must be powers of two >= 128
    (reference: mipheivit.py:115-121)."""

    vit_cfg: ViTConfig
    out_chans: int = 16
    fast_heads: bool = False
    conv_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = Encoder(self.vit_cfg, name="encoder")(x)
        out = DetailCapture(self.out_chans, fast_heads=self.fast_heads,
                            conv_impl=self.conv_impl, name="decoder")(
            feats, x.astype(feats.dtype), train
        )
        return out.astype(jnp.float32)


def check_input_size(img_size: Tuple[int, int]) -> None:
    """Power-of-two >=128 constraint (reference: mipheivit.py:115-121)."""
    for s in img_size:
        if s == 0 or (s & (s - 1)) != 0:
            raise ValueError("Both height and width must be powers of 2")
        if s < 128:
            raise ValueError("Height and width must be >= 128")
