"""70x70 PatchGAN discriminator with spectral normalization.

Reference: ``DiscriminatorPatch`` (src/models.py:399-485) — 4x4 convs,
stride-2 pyramid, spectral_norm on every conv, LeakyReLU(0.2), optional
batch/instance norm (default none), optional ``selected_channels`` so the
structural-GAN mode only discriminates structural markers
(src/train.py:155-160). Input is concat(H&E, generated) along channels.

Spectral norm is torch-parity: one power iteration per training forward on
the weight reshaped to [out, -1], u persisted in a mutable ``spectral``
collection, sigma detached from the gradient path exactly like
torch.nn.utils.spectral_norm (eps 1e-12).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

conv_init = nn.initializers.normal(0.02)


class SpectralConv(nn.Module):
    """Conv2d wrapped in spectral normalization (NHWC)."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", conv_init, (k, k, in_ch, self.features)
        )
        # torch reshapes OIHW to [out, in*k*k]; HWIO -> transpose to OHWI
        w_mat = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)
        u_var = self.variable(
            "spectral", "u",
            lambda: jax.random.normal(
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                (self.features,),
            ),
        )
        u = u_var.value
        eps = 1e-12

        def norm(v):
            return v / (jnp.linalg.norm(v) + eps)

        if update_stats:
            v = norm(jax.lax.stop_gradient(w_mat).T @ u)
            u = norm(jax.lax.stop_gradient(w_mat) @ v)
            u_var.value = u
        else:
            v = norm(jax.lax.stop_gradient(w_mat).T @ u)
        sigma = jnp.einsum("i,ij,j->", jax.lax.stop_gradient(u), w_mat,
                           jax.lax.stop_gradient(v))
        w_sn = kernel / sigma

        out = jax.lax.conv_general_dilated(
            x, w_sn.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class DiscriminatorPatch(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    dropout_rate: float = 0.0
    norm_layer_type: Optional[str] = None
    selected_channels: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x, fake_images, train: bool = False):
        if self.selected_channels is not None:
            fake_images = fake_images[..., list(self.selected_channels)]
        h = jnp.concatenate([x, fake_images], axis=-1)

        def maybe_norm(h):
            if self.norm_layer_type == "batch":
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5)(h)
            if self.norm_layer_type == "instance":
                # InstanceNorm(affine): normalize over H,W per sample/channel
                mean = h.mean(axis=(1, 2), keepdims=True)
                var = h.var(axis=(1, 2), keepdims=True)
                h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
                scale = self.param(f"in_scale_{h.shape[-1]}",
                                   nn.initializers.ones, (h.shape[-1],))
                bias = self.param(f"in_bias_{h.shape[-1]}",
                                  nn.initializers.zeros, (h.shape[-1],))
                return h * scale + bias
            return h

        use_bias = self.norm_layer_type is None
        h = SpectralConv(self.ndf, 4, 2, name="conv0")(h, update_stats=train)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = SpectralConv(self.ndf * nf, 4, 2, use_bias=use_bias,
                             name=f"conv{n}")(h, update_stats=train)
            h = maybe_norm(h)
            h = nn.leaky_relu(h, 0.2)
            if self.dropout_rate > 0 and train:
                h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        nf = min(2 ** self.n_layers, 8)
        h = SpectralConv(self.ndf * nf, 4, 1, use_bias=use_bias,
                         name=f"conv{self.n_layers}")(h, update_stats=train)
        h = maybe_norm(h)
        h = nn.leaky_relu(h, 0.2)
        h = SpectralConv(1, 4, 1, name="conv_out")(h, update_stats=train)
        return h
