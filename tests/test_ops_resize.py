"""Resize parity vs torch.nn.functional.interpolate (the numerics oracle).

The 0.5%-Pearson checkpoint-parity budget (BASELINE.md) hinges on these ops
matching torch bit-for-bit-ish; tolerances here are float32 roundoff only.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F


from mipheivit_tpu.ops import (

    resize_bicubic,
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear,
)

pytestmark = pytest.mark.tier0


def _torch_resize(x_nchw, size, mode, antialias=False):
    t = torch.from_numpy(x_nchw)
    out = F.interpolate(t, size=size, mode=mode, align_corners=False if mode != "nearest" else None,
                        antialias=antialias)
    return out.numpy()


@pytest.mark.parametrize("in_hw,out_hw", [((18, 18), (16, 16)), ((16, 16), (32, 32)),
                                          ((37, 37), (18, 18)), ((7, 9), (13, 5))])
def test_bicubic_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    ours = np.asarray(resize_bicubic(x, out_hw))
    ref = _torch_resize(x, out_hw, "bicubic")
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_bicubic_antialias_matches_torch(rng):
    x = rng.standard_normal((1, 2, 37, 37)).astype(np.float32)
    ours = np.asarray(resize_bicubic(x, (18, 18), antialias=True))
    ref = _torch_resize(x, (18, 18), "bicubic", antialias=True)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (32, 32)), ((33, 17), (66, 34)),
                                          ((64, 64), (31, 31))])
def test_bilinear_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, 4, *in_hw)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, out_hw))
    ref = _torch_resize(x, out_hw, "bilinear")
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_upsample2x_is_bilinear2x(rng):
    x = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    ours = np.asarray(upsample2x_bilinear(x))
    ref = _torch_resize(x, (32, 32), "bilinear")
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_nearest_matches_torch(rng):
    x = rng.integers(0, 1000, (1, 1, 25, 25)).astype(np.float32)
    ours = np.asarray(resize_nearest(x, (13, 13)))
    ref = _torch_resize(x, (13, 13), "nearest")
    np.testing.assert_array_equal(ours, ref)
    # nearest-exact
    t = torch.from_numpy(x)
    ref2 = F.interpolate(t, size=(13, 13), mode="nearest-exact").numpy()
    ours2 = np.asarray(resize_nearest(x, (13, 13), exact=True))
    np.testing.assert_array_equal(ours2, ref2)


def test_upsample2x_nhwc_matches_torch(rng):
    from mipheivit_tpu.ops import upsample2x_bilinear_nhwc

    x = rng.standard_normal((2, 9, 7, 5)).astype(np.float32)
    ours = np.asarray(upsample2x_bilinear_nhwc(x.transpose(0, 3, 1, 2)
                                               .transpose(0, 2, 3, 1)))
    ref = _torch_resize(x.transpose(0, 3, 1, 2), (18, 14), "bilinear")
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               atol=2e-6, rtol=1e-5)
