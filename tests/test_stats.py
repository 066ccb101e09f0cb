"""Normalization codec tests (reference semantics: src/dataset.py:545-606)."""

import json


import numpy as np
import pytest

from mipheivit_tpu.data import (

    HOPTIMUS_MEAN,
    HOPTIMUS_STD,
    IMAGENET_MEAN,
    Normalizer,
    get_effective_width_height,
    get_input_mean_std,
    load_channel_stats,
)

pytestmark = pytest.mark.tier0


def test_if_roundtrip(rng):
    norm = Normalizer(mode="if")
    x = rng.integers(0, 256, size=(8, 8, 16)).astype(np.float32)
    y = norm(x)
    assert y.min() >= -0.9 - 1e-6 and y.max() <= 0.9 + 1e-6
    np.testing.assert_allclose(norm.unormalize(y), x, atol=1e-4)
    # exact endpoints
    assert norm(np.float32(0)) == pytest.approx(-0.9)
    assert norm(np.float32(255)) == pytest.approx(0.9)


def test_he_normalization(rng):
    stats = {"mean": [10.0, 20.0, 30.0], "std": [2.0, 4.0, 8.0]}
    # reference passes a single dict whose mean/std are 3-vectors
    norm = Normalizer(stats, mode="he")
    x = rng.uniform(0, 255, size=(4, 4, 3)).astype(np.float32)
    y = norm(x)
    np.testing.assert_allclose(
        y, (x - np.array(stats["mean"])) / np.array(stats["std"]), rtol=1e-6
    )
    np.testing.assert_allclose(norm.unormalize(y), x, rtol=1e-5)


def test_encoder_dependent_constants():
    out = get_input_mean_std("myvitmatte", "hoptimus0", {})
    np.testing.assert_allclose(out["mean"], HOPTIMUS_MEAN)
    np.testing.assert_allclose(out["std"], HOPTIMUS_STD)
    out = get_input_mean_std("unet", "univ2", {})
    np.testing.assert_allclose(out["mean"], IMAGENET_MEAN)
    out = get_input_mean_std("hemit", None, {"mean": [1, 2, 3], "std": [4, 5, 6]})
    np.testing.assert_allclose(out["mean"], [1, 2, 3])


def test_effective_width_height():
    assert get_effective_width_height(300, 300, train=True) == (256, 256)
    assert get_effective_width_height(256, 256, train=True) == (256, 256)
    assert get_effective_width_height(300, 300, train=False) == (300, 300)


def test_channel_stats_contract(tmp_path):
    stats = {
        "RGB": {"mean": [200.0, 150.0, 180.0], "std": [30.0, 40.0, 25.0]},
        "Hoechst": {"idx_channel": 0, "std": 40.0, "min": 0.0, "is_structural": True},
        "CD31": {"idx_channel": 1, "std": 11.0, "min": 0.0, "is_structural": True},
        "CD3e": {"idx_channel": 10, "std": 9.0, "min": 1.0, "is_structural": False},
    }
    path = tmp_path / "channel_stats.json"
    path.write_text(json.dumps(stats))
    cs = load_channel_stats(str(path))
    names = ["Hoechst", "CD31", "CD3e"]
    assert cs.channel_idxs(names) == [0, 1, 10]
    np.testing.assert_allclose(cs.stds(names), [40.0, 11.0, 9.0])
    np.testing.assert_allclose(cs.structural_mask(names), [True, True, False])
    assert cs.rgb["mean"] == [200.0, 150.0, 180.0]
