"""Tensor-parallel encoder sharding on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mipheivit_tpu.models import MipheiViT, ViTConfig
from mipheivit_tpu.parallel import (
    batch_sharding,
    encoder_param_specs,
    make_mesh,
    shard_params,
)


def test_tp_forward_matches_replicated(rng):
    """dp=4 x tp=2 mesh: tensor-sharded forward must equal single-device."""
    assert jax.device_count() == 8
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = ViTConfig(img_size=(32, 32), patch_size=4, embed_dim=32, depth=2,
                    num_heads=2, mlp_hidden_dim=64, reg_tokens=4,
                    attn_impl="xla", remat=False, lora_rank=2)
    model = MipheiViT(vit_cfg=cfg, out_chans=4)
    x = jnp.array(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False))

    specs = encoder_param_specs(variables["params"])
    qkv_spec = specs["encoder"]["vit"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv_spec == P(None, None, "model")
    proj_spec = specs["encoder"]["vit"]["blocks"]["attn"]["proj"]["kernel"]
    assert proj_spec == P(None, "model", None)

    sharded_params = shard_params(variables["params"], mesh)
    stats = jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())),
        variables["batch_stats"])
    xs = jax.device_put(x, batch_sharding(mesh))

    fwd = jax.jit(lambda p, s, xx: model.apply(
        {"params": p, "batch_stats": s}, xx, train=False))
    out = np.asarray(fwd(sharded_params, stats, xs))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    # params actually live sharded on the model axis
    qkv = sharded_params["encoder"]["vit"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, None, "model")
