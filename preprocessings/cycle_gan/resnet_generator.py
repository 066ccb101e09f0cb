"""CycleGAN ResnetGenerator (stain normalizer) in flax + torch import.

Reference: preprocessings/cycle_gan/ vendors the pix2pix ResnetGenerator
(c7s1-64, d128, d256, 9 resnet blocks, u128, u64, c7s1-3, InstanceNorm,
reflection padding) whose checkpoints produce the stain-normalized tile
replicas used by the augmentation-swap callbacks (src/callbacks.py:152-224).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def _rpad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False) parity (CycleGAN default)."""

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class ResnetBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = _rpad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv1")(h)
        h = nn.relu(InstanceNorm()(h))
        h = _rpad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv2")(h)
        return x + InstanceNorm()(h)


class ResnetGenerator(nn.Module):
    ngf: int = 64
    n_blocks: int = 9
    out_channels: int = 3

    @nn.compact
    def __call__(self, x):  # x: [B,H,W,3] in [-1, 1]
        h = _rpad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", name="stem")(h)
        h = nn.relu(InstanceNorm()(h))
        for i, mult in enumerate((2, 4)):
            h = nn.Conv(self.ngf * mult, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), name=f"down{i}")(h)
            h = nn.relu(InstanceNorm()(h))
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, name=f"res{i}")(h)
        for i, mult in enumerate((2, 1)):
            h = nn.ConvTranspose(self.ngf * mult, (3, 3), strides=(2, 2),
                                 padding="SAME", name=f"up{i}")(h)
            h = nn.relu(InstanceNorm()(h))
        h = _rpad(h, 3)
        h = nn.Conv(self.out_channels, (7, 7), padding="VALID", name="head")(h)
        return jnp.tanh(h)


def params_from_torch(state: Dict[str, np.ndarray], ngf: int = 64,
                      n_blocks: int = 9) -> Dict:
    """Import a pix2pix/CycleGAN ``model.N.*`` Sequential state dict.

    Layout: 1=stem conv, 4/7=down convs, 10..10+3n (step 3 w/ submodule
    conv_block.{1,5})=res blocks, then two ConvTranspose, final conv.
    """
    def conv(k):
        return np.ascontiguousarray(np.asarray(state[k]).transpose(2, 3, 1, 0))

    def convT(k):
        # torch ConvTranspose2d weight [in, out, kh, kw] -> flax [kh, kw, in, out]
        return np.ascontiguousarray(np.asarray(state[k]).transpose(2, 3, 0, 1))

    params: Dict = {
        "stem": {"kernel": conv("model.1.weight"), "bias": state["model.1.bias"]},
        "down0": {"kernel": conv("model.4.weight"), "bias": state["model.4.bias"]},
        "down1": {"kernel": conv("model.7.weight"), "bias": state["model.7.bias"]},
    }
    base = 10
    for i in range(n_blocks):
        params[f"res{i}"] = {
            "conv1": {"kernel": conv(f"model.{base + i}.conv_block.1.weight"),
                      "bias": state[f"model.{base + i}.conv_block.1.bias"]},
            "conv2": {"kernel": conv(f"model.{base + i}.conv_block.5.weight"),
                      "bias": state[f"model.{base + i}.conv_block.5.bias"]},
        }
    up0 = base + n_blocks
    params["up0"] = {"kernel": convT(f"model.{up0}.weight"),
                     "bias": state[f"model.{up0}.bias"]}
    params["up1"] = {"kernel": convT(f"model.{up0 + 3}.weight"),
                     "bias": state[f"model.{up0 + 3}.bias"]}
    head = up0 + 7
    params["head"] = {"kernel": conv(f"model.{head}.weight"),
                      "bias": state[f"model.{head}.bias"]}
    return params
