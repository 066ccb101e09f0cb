"""HEMIT baseline zoo: pix2pix generators/discriminators + the paper's
dual-branch ``ResnetGeneratorSwinT``.

Reference: src/generators/hemit_models.py — ResnetGenerator (c7s1 + 3 down
+ resnet blocks + 3 up, hemit-variant with skip concats), the SwinT branch
(timm swin-tiny), and 3 ``GatedCrossAttention`` fusions: sigmoid gate
selects the top-k CNN positions, multi-head cross-attention attends those
queries over the (upsampled) Swin features at the same positions, results
scattered back (hemit_models.py:1225-1298). top-k is a fixed k so the
whole thing jits with static shapes (k is clamped to H*W).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.deconv import TorchConvTranspose
from .swin import SwinConfig, SwinTransformer


def _rpad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class _Norm(nn.Module):
    kind: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name="norm", dtype=x.dtype)(x)
        if self.kind == "instance":
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return x


class HemitResnetBlock(nn.Module):
    dim: int
    norm: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _rpad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv1",
                    dtype=x.dtype)(h)
        h = nn.relu(_Norm(self.norm, name="n1")(h, train))
        if self.use_dropout:
            # reference ResnetBlock: Dropout(0.5) between the two convs
            # (hemit_models.py:285-286)
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _rpad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv2",
                    dtype=x.dtype)(h)
        return x + _Norm(self.norm, name="n2")(h, train)


class GatedCrossAttention(nn.Module):
    """Top-k gated cross-attention fusion (reference: :1225-1298)."""

    cnn_channels: int
    num_heads: int = 8
    k: int = 1000
    upsample_factor: int = 2

    @nn.compact
    def __call__(self, cnn_feat, swin_feat, train: bool = False):
        c = self.cnn_channels
        s = nn.Conv(c, (1, 1), name="swinT_transform",
                    dtype=cnn_feat.dtype)(swin_feat)
        for i in range(self.upsample_factor):
            # torch ConvTranspose2d(k4,s2,p1): exact (incl. edges) via
            # TorchConvTranspose (VERDICT r1 #7)
            s = TorchConvTranspose(c, (4, 4), strides=(2, 2), padding=1,
                                   name=f"up{i}_deconv", dtype=s.dtype)(s)
            s = nn.relu(s)
            s = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"up{i}_conv", dtype=s.dtype)(s)

        gate = nn.sigmoid(nn.Conv(1, (1, 1), name="gate",
                                  dtype=cnn_feat.dtype)(cnn_feat))
        b, h, w, _ = cnn_feat.shape
        n = h * w
        k = min(self.k, n)
        flat_cnn = cnn_feat.reshape(b, n, c)
        flat_swin = s.reshape(b, n, c)
        _, top_idx = jax.lax.top_k(gate.reshape(b, n), k)

        q = jnp.take_along_axis(flat_cnn, top_idx[..., None], axis=1)
        kv = jnp.take_along_axis(flat_swin, top_idx[..., None], axis=1)

        # torch nn.MultiheadAttention parity: packed in-proj + out-proj
        head_dim = c // self.num_heads
        qp = nn.Dense(c, name="attn_q", dtype=q.dtype)(q)
        kp = nn.Dense(c, name="attn_k", dtype=q.dtype)(kv)
        vp = nn.Dense(c, name="attn_v", dtype=q.dtype)(kv)

        def heads(t):
            return t.reshape(b, k, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhnd,bhmd->bhnm", heads(qp), heads(kp),
                            preferred_element_type=jnp.float32) / np.sqrt(head_dim)
        attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, heads(vp))
        out = out.transpose(0, 2, 1, 3).reshape(b, k, c)
        out = nn.Dense(c, name="attn_out", dtype=q.dtype)(out)

        # scatter attended values back into the full map
        attended = flat_cnn
        batch_idx = jnp.arange(b)[:, None]
        attended = attended.at[batch_idx, top_idx].set(out)
        return attended.reshape(b, h, w, c)


class ResnetGeneratorSwinT(nn.Module):
    """HEMIT dual-branch generator (reference: :1058-1222)."""

    out_channels: int
    ngf: int = 64
    n_blocks: int = 6
    norm: str = "batch"
    swin_cfg: Optional[SwinConfig] = None
    top_k: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        ngf = self.ngf
        # initial c7s1-64
        h = _rpad(x, 3)
        h = nn.Conv(ngf, (7, 7), padding="VALID", name="initial_conv",
                    dtype=x.dtype)(h)
        h = nn.relu(_Norm(self.norm, name="initial_norm")(h, train))

        downs = []
        for i in range(3):
            mult = 2 ** i
            h = nn.Conv(ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"down{i}_conv",
                        dtype=h.dtype)(h)
            h = nn.relu(_Norm(self.norm, name=f"down{i}_norm")(h, train))
            downs.append(h)

        for i in range(self.n_blocks):
            h = HemitResnetBlock(ngf * 8, self.norm, name=f"res{i}")(h, train)

        swin_cfg = self.swin_cfg or SwinConfig(
            img_size=(x.shape[1], x.shape[2]), dtype=str(x.dtype))
        _, swin_feats = SwinTransformer(swin_cfg, name="swinT")(
            x, collect="post_downsample")
        # swin taps: dims [192, 384, 768] at strides 8/16/32; upsample factor
        # log2(patch)=2 brings them to the CNN branch strides 2/4/8
        for i in range(3):
            downs[i] = GatedCrossAttention(
                ngf * 2 ** (i + 1), k=self.top_k,
                upsample_factor=int(np.log2(swin_cfg.patch_size)),
                name=f"cross_att{i}")(downs[i], swin_feats[i], train)

        for i, feat in enumerate(reversed(downs)):
            h = jnp.concatenate([h, feat], axis=-1)
            mult = 2 ** (3 - i)
            # torch ConvTranspose2d(k3,s2,p1,op1): asymmetric pad (1,2)
            h = TorchConvTranspose(int(ngf * mult / 2), (3, 3),
                                   strides=(2, 2), padding=1,
                                   output_padding=1,
                                   name=f"up{i}_deconv", dtype=h.dtype)(h)
            h = nn.relu(_Norm(self.norm, name=f"up{i}_norm")(h, train))

        h = _rpad(h, 3)
        h = nn.Conv(self.out_channels, (7, 7), padding="VALID",
                    name="final_conv", dtype=h.dtype)(h)
        return jnp.tanh(h).astype(jnp.float32)


class ResnetGenerator(nn.Module):
    """Plain pix2pix ResnetGenerator (reference zoo: hemit_models.py)."""

    out_channels: int
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _rpad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", name="stem",
                    dtype=x.dtype)(h)
        h = nn.relu(_Norm(self.norm, name="stem_norm")(h, train))
        for i in range(2):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"down{i}",
                        dtype=h.dtype)(h)
            h = nn.relu(_Norm(self.norm, name=f"down{i}_norm")(h, train))
        for i in range(self.n_blocks):
            h = HemitResnetBlock(self.ngf * 4, self.norm,
                                 use_dropout=self.use_dropout,
                                 name=f"res{i}")(h, train)
        for i in range(2):
            mult = 2 ** (2 - i)
            h = TorchConvTranspose(int(self.ngf * mult / 2), (3, 3),
                                   strides=(2, 2), padding=1,
                                   output_padding=1,
                                   name=f"up{i}", dtype=h.dtype)(h)
            h = nn.relu(_Norm(self.norm, name=f"up{i}_norm")(h, train))
        h = _rpad(h, 3)
        h = nn.Conv(self.out_channels, (7, 7), padding="VALID",
                    name="head", dtype=h.dtype)(h)
        return jnp.tanh(h).astype(jnp.float32)


class UnetGenerator(nn.Module):
    """pix2pix UNet generator (reference zoo), 8-level skip UNet."""

    out_channels: int
    num_downs: int = 7
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = [min(self.ngf * 2 ** i, self.ngf * 8)
                 for i in range(self.num_downs)]
        skips = []
        h = x
        for i, c in enumerate(chans):
            h = nn.Conv(c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"down{i}", dtype=h.dtype)(h)
            if 0 < i < self.num_downs - 1:
                h = _Norm(self.norm, name=f"down{i}_norm")(h, train)
            skips.append(h)
            h = nn.leaky_relu(h, 0.2)
        for i, c in enumerate(reversed(chans[:-1])):
            h = nn.relu(h)
            h = TorchConvTranspose(c, (4, 4), strides=(2, 2), padding=1,
                                   name=f"up{i}", dtype=h.dtype)(h)
            h = _Norm(self.norm, name=f"up{i}_norm")(h, train)
            if self.use_dropout and 1 <= i <= self.num_downs - 5:
                # reference UnetSkipConnectionBlock: Dropout(0.5) after the
                # up-norm of the intermediate ngf*8 blocks only — not the
                # innermost (up0) nor the outer resolution blocks
                # (hemit_models.py:327,395-396)
                h = nn.Dropout(0.5, deterministic=not train)(h)
            h = jnp.concatenate([h, skips[self.num_downs - 2 - i]], axis=-1)
        h = nn.relu(h)
        h = TorchConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                               padding=1, name="up_final", dtype=h.dtype)(h)
        return jnp.tanh(h).astype(jnp.float32)


class NLayerDiscriminator(nn.Module):
    """pix2pix 70x70 PatchGAN without spectral norm (reference zoo)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="conv0", dtype=x.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        for i in range(1, self.n_layers):
            nf = min(2 ** i, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"conv{i}", dtype=h.dtype)(h)
            h = nn.leaky_relu(_Norm(self.norm, name=f"norm{i}")(h, train), 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name=f"conv{self.n_layers}", dtype=h.dtype)(h)
        h = nn.leaky_relu(_Norm(self.norm, name="norm_last")(h, train), 0.2)
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), name="conv_out",
                       dtype=h.dtype)(h)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN (reference zoo)."""

    ndf: int = 64
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.ndf, (1, 1), name="conv0", dtype=x.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.ndf * 2, (1, 1), use_bias=False, name="conv1",
                    dtype=h.dtype)(h)
        h = nn.leaky_relu(_Norm(self.norm, name="norm1")(h, train), 0.2)
        return nn.Conv(1, (1, 1), name="conv_out", dtype=h.dtype)(h)


def build_hemit(img_size, nc_in: int, nc_out: int, cfg=None,
                dtype: str = "float32"):
    """reference get_generator_hemit(netG='SwinTResnet') parity."""
    if isinstance(img_size, int):
        img_size = (img_size, img_size)
    swin_cfg = SwinConfig(img_size=img_size, dtype=dtype)
    return ResnetGeneratorSwinT(out_channels=nc_out, ngf=64, n_blocks=6,
                                norm="batch", swin_cfg=swin_cfg)


def build_hemit_netG(netG: str, img_size, nc_in: int, nc_out: int,
                     dtype: str = "float32", norm: str = "batch",
                     use_dropout: bool = False):
    """Full ``get_generator_hemit`` dispatch
    (reference: src/generators/hemit_models.py:16-110).

    netG: resnet_9blocks | resnet_6blocks | unet_128 | unet_256 | unet_1024
          | swinT (HybridSwinT) | swinT_old (HybridSwinT_2)
          | SwinTUnet (SwinUnetGenerator) | SwinTResnet (the paper model).
    """
    if isinstance(img_size, int):
        img_size = (img_size, img_size)
    if netG in ("resnet_9blocks", "resnet_6blocks"):
        return ResnetGenerator(out_channels=nc_out, ngf=64,
                               n_blocks=9 if netG.endswith("9blocks") else 6,
                               norm=norm, use_dropout=use_dropout)
    if netG in ("unet_128", "unet_256", "unet_1024"):
        num_downs = {"unet_128": 7, "unet_256": 8, "unet_1024": 10}[netG]
        return UnetGenerator(out_channels=nc_out, num_downs=num_downs,
                             ngf=64, norm=norm, use_dropout=use_dropout)
    if netG == "swinT":
        from .hemit_hybrid import HybridSwinT

        return HybridSwinT(out_channels=nc_out, depths=(1, 1, 3, 1),
                           window_size=8, dtype=dtype)
    if netG == "swinT_old":
        from .hemit_hybrid import HybridSwinT_2

        return HybridSwinT_2(out_channels=nc_out, depths=(2, 2, 6, 2),
                             window_size=8, dtype=dtype)
    if netG == "SwinTUnet":
        from .hemit_hybrid import SwinUnetGenerator

        # factory: patch 32, window 64 for 1024-px crops — scale the patch
        # with the crop so the Swin pyramid lands on the 16/8/4 U-Net taps
        patch = max(1, img_size[0] // 32)
        num_downs = int(np.log2(img_size[0]))   # 10 for the 1024-px crops
        return SwinUnetGenerator(out_channels=nc_out, num_downs=num_downs,
                                 patch_size=patch, window_size=64,
                                 dtype=dtype)
    if netG == "SwinTResnet":
        return build_hemit(img_size, nc_in, nc_out, dtype=dtype)
    raise NotImplementedError(f"unknown netG {netG!r}")
