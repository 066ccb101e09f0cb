"""Per-nucleus pooling vs a numpy reference (SURVEY.md §4 test strategy)."""

import numpy as np
import jax.numpy as jnp

import pytest


from mipheivit_tpu.ops import nucleus_pool, segment_mean_pool

pytestmark = pytest.mark.tier0


def _numpy_means(values, labels):
    """Reference per-sample pooling (mirrors torch.unique + scatter_add_)."""
    out = {}
    for b in range(values.shape[0]):
        labs = labels[b].reshape(-1)
        vals = values[b].reshape(-1, values.shape[-1])
        for lab in np.unique(labs):
            if lab == 0:
                continue
            m = labs == lab
            out[(b, int(lab))] = (vals[m].sum(0), int(m.sum()))
    return out


def test_nucleus_pool_matches_numpy(rng):
    B, H, W, C = 2, 32, 32, 5
    labels = rng.integers(0, 17, (B, H, W)).astype(np.int32) * rng.integers(0, 2, (B, H, W)).astype(np.int32)
    values = rng.standard_normal((B, H, W, C)).astype(np.float32)
    ids, sums, counts = nucleus_pool(jnp.array(values), jnp.array(labels), capacity=64)
    ids, sums, counts = map(np.asarray, (ids, sums, counts))

    ref = _numpy_means(values, labels)
    got = {}
    for b in range(B):
        for slot in range(ids.shape[1]):
            if counts[b, slot] > 0 and ids[b, slot] > 0:
                got[(b, int(ids[b, slot]))] = (sums[b, slot], int(counts[b, slot]))
    assert set(got) == set(ref)
    for key in ref:
        np.testing.assert_allclose(got[key][0], ref[key][0], atol=1e-4)
        assert got[key][1] == ref[key][1]


def test_segment_mean_pool_valid_mask(rng):
    B, H, W, C = 1, 16, 16, 3
    labels = np.zeros((B, H, W), np.int32)
    labels[0, :4, :4] = 7
    labels[0, 8:12, 8:12] = 42
    values = rng.standard_normal((B, H, W, C)).astype(np.float32)
    ids, means, valid = segment_mean_pool(jnp.array(values), jnp.array(labels), capacity=8)
    ids, means, valid = map(np.asarray, (ids, means, valid))
    assert valid.sum() == 2
    for lab in (7, 42):
        slot = np.where(ids[0] == lab)[0][0]
        mask = labels[0] == lab
        np.testing.assert_allclose(means[0, slot], values[0][mask].mean(0), atol=1e-5)
