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
