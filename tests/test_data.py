"""Data layer: datasets, loader, sampler, augmentations, HED math."""

import numpy as np
import pandas as pd
import pytest


from mipheivit_tpu.data.augment import (
    ColorAugment,
    HedColorAugment,
    SpatialAugment,
    center_crop,
)
from mipheivit_tpu.data.dataset import (
    DataModule,
    SlideImg2ImgDataset,
    TileImg2ImgDataset,
)
from mipheivit_tpu.data.pipeline import Loader, collate, device_prefetch
from mipheivit_tpu.data.sampler import BalancedPositiveSampler
from mipheivit_tpu.data.stats import Normalizer
from mipheivit_tpu.ops.hed import hed2rgb, rgb2hed
from mipheivit_tpu.slideio import build_ome_xml, write_pyramid

pytestmark = pytest.mark.tier0


@pytest.fixture(scope="module")
def tile_tree(tmp_path_factory):
    """Synthetic tile files + dataframe (the reference data contract)."""
    import cv2

    root = tmp_path_factory.mktemp("tiles")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        he = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        mif = rng.integers(0, 255, (4, 64, 64), dtype=np.uint8)
        nuc = np.zeros((1, 64, 64), np.int32)
        nuc[0, 10:30, 10:30] = i + 1
        img_path = str(root / f"tile{i}.png")
        cv2.imwrite(img_path, cv2.cvtColor(he, cv2.COLOR_RGB2BGR))
        targ_path = str(root / f"tile{i}_mif.tiff")
        write_pyramid(targ_path, mif, n_levels=1, tile_size=64)
        nuc_path = str(root / f"tile{i}_nuc.tiff")
        write_pyramid(nuc_path, nuc, n_levels=1, tile_size=64)
        rows.append({
            "image_path": img_path, "target_path": targ_path,
            "nuclei_path": nuc_path, "in_slide_name": f"slide{i % 2}",
            "CD31_count": 10 * (i % 3), "CD31_prop": 0.1,
            "CD3e_count": i, "CD3e_prop": 0.02,
        })
    return pd.DataFrame(rows)


def test_hed_roundtrip(rng):
    # hed -> rgb -> hed is exact for non-negative stain concentrations
    # (skimage clips stains at 0, so the rgb->hed->rgb direction is lossy
    # for colors outside the stain hull — same as skimage).
    # keep concentrations small enough that exp(-13.8 * hed @ M) stays
    # above the 1e-6 floor both directions apply
    hed = rng.random((16, 16, 3)).astype(np.float64) * 0.2
    rgb = hed2rgb(hed)
    np.testing.assert_allclose(rgb2hed(rgb), hed, atol=1e-6)
    # white has zero stain concentration
    np.testing.assert_allclose(rgb2hed(np.ones((2, 2, 3))), 0.0, atol=1e-6)


def test_hed_augment_uint8(rng):
    img = rng.integers(60, 200, (32, 32, 3), dtype=np.uint8)
    aug = HedColorAugment(thresh=0.015, p=1.0)
    out = aug(img, np.random.default_rng(3))
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert not np.array_equal(out, img)         # changed
    # random RGB sits partly outside the stain hull, so the clip-through-HED
    # shift dominates the 1.5% jitter; just bound it loosely
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 60


def test_spatial_joint_transform(rng):
    sp = SpatialAugment(16, 16, training=True, dropout_p=0.0)
    image = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    target = image[..., :1].copy()
    out = sp({"image": image, "image_target": target}, np.random.default_rng(3))
    # joint: the same crop/flip applied -> channel 0 still matches
    np.testing.assert_array_equal(out["image"][..., 0], out["image_target"][..., 0])
    assert out["image"].shape == (16, 16, 3)
    # eval center crop
    spe = SpatialAugment(16, 16, training=False)
    oute = spe({"image": image}, np.random.default_rng(0))
    np.testing.assert_array_equal(oute["image"], center_crop(image, 16, 16))


def test_tile_img2img_dataset(tile_tree):
    he_norm = Normalizer({"mean": [128.0] * 3, "std": [30.0] * 3}, mode="he")
    if_norm = Normalizer(mode="if")
    ds = TileImg2ImgDataset(
        tile_tree, targ_channel_idxs=[0, 2],
        preprocess_input_fn=he_norm, preprocess_target_fn=if_norm,
        return_nuclei=True)
    sample = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert sample["image"].shape == (64, 64, 3)
    assert sample["target"].shape == (64, 64, 2)
    assert sample["nuclei"].dtype == np.int32
    assert sample["target"].min() >= -0.9 - 1e-5
    assert sample["slide_name"] == "slide0"


def test_loader_batching_and_determinism(tile_tree):
    ds = TileImg2ImgDataset(tile_tree, targ_channel_idxs=[0, 1])
    loader = Loader(ds, batch_size=2, shuffle=True, drop_last=True,
                    num_workers=2, seed=7)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert isinstance(batches[0]["tile_name"], list)
    # same seed -> same order and content
    batches2 = list(loader)
    np.testing.assert_array_equal(batches[0]["image"], batches2[0]["image"])
    # sharding: 2 shards cover disjoint halves
    l0 = Loader(ds, 1, seed=3).shard(0, 2)
    l1 = Loader(ds, 1, seed=3).shard(1, 2)
    names0 = {b["tile_name"][0] for b in l0}
    names1 = {b["tile_name"][0] for b in l1}
    assert names0.isdisjoint(names1) and len(names0 | names1) == 6


def test_device_prefetch(tile_tree):
    import jax

    ds = TileImg2ImgDataset(tile_tree, targ_channel_idxs=[0])
    loader = Loader(ds, batch_size=3, num_workers=1)
    got = list(device_prefetch(loader, size=2))
    assert len(got) == 2
    assert isinstance(got[0]["image"], jax.Array)
    assert got[0]["tile_name"] is not None


def test_balanced_sampler(tile_tree):
    sampler = BalancedPositiveSampler(tile_tree, ["CD31", "CD3e"], thresh=4,
                                      other_percent=0.5, seed=0)
    assert sampler.column_name == "CD31_count"
    idx = sampler.epoch_indices()
    assert len(idx) >= 4
    pos = tile_tree["CD31_count"].to_numpy()[idx] > 4
    assert pos.mean() >= 0.4  # positives enriched
    with pytest.raises(ValueError):
        BalancedPositiveSampler(tile_tree, ["CD31"], thresh=0.5)


def test_slide_dataset_from_wsi(tmp_path, rng):
    he = rng.integers(0, 255, (3, 256, 256), dtype=np.uint8)
    mif = rng.integers(0, 255, (4, 256, 256), dtype=np.uint8)
    he_path = str(tmp_path / "he.tiff")
    mif_path = str(tmp_path / "mif.tiff")
    write_pyramid(he_path, he, n_levels=2, tile_size=64)
    write_pyramid(mif_path, mif, n_levels=2, tile_size=64)
    slide_df = pd.DataFrame([{
        "in_slide_name": "s0", "in_slide_path": he_path,
        "targ_slide_path": mif_path, "nuclei_slide_path": None,
    }])
    tile_df = pd.DataFrame([
        {"in_slide_name": "s0", "x": 0, "y": 0, "level": 0,
         "tile_size_x": 64, "tile_size_y": 64},
        {"in_slide_name": "s0", "x": 192, "y": 192, "level": 0,
         "tile_size_x": 64, "tile_size_y": 64},
    ])
    ds = SlideImg2ImgDataset(slide_df, tile_df, targ_channel_idxs=[1, 3])
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(
        s["image"], np.moveaxis(he[:, :64, :64], 0, -1))
    np.testing.assert_array_equal(
        s["target"], np.moveaxis(mif[[1, 3], :64, :64], 0, -1))
    assert s["tile_name"] == "s0_0_0_0_64_64"


def test_datamodule_end_to_end(tile_tree):
    dm = DataModule(
        slide_dataframe=None, train_dataframe=tile_tree,
        val_dataframe=tile_tree, test_dataframe=tile_tree,
        targ_channel_idxs=[0, 1], batch_size=2, input_shape=(32, 32),
        from_slide=False, num_workers=1)
    dm.setup()
    train_batch = next(iter(dm.loader("train")))
    assert train_batch["image"].shape == (2, 32, 32, 3)
    val_batch = next(iter(dm.loader("val")))
    assert val_batch["image"].shape == (2, 32, 32, 3)


def test_slide_dataset_input_only(tmp_path, rng):
    from mipheivit_tpu.data.dataset import SlideDataset

    he = rng.integers(0, 255, (3, 128, 128), dtype=np.uint8)
    path = str(tmp_path / "he_only.tiff")
    write_pyramid(path, he, n_levels=2, tile_size=64)
    ds = SlideDataset.from_one_slide(path, [(0, 0), (64, 64)], 64)
    assert len(ds) == 2
    s = ds.__getitem__(0, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(
        s["image"], np.moveaxis(he[:, :64, :64], 0, -1))
    assert s["tile_name"] == "he_only_0_0_0_64_64"
    assert "target" not in s
