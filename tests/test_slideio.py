"""Golden-tile tests for the native slidetiff engine (SURVEY.md §4 item 2:
synthetic OME-TIFF pyramids written by the tile-writer and read back —
replaces the reference's broken slidevips test)."""

import numpy as np
import pytest

from mipheivit_tpu.slideio import (
    SlideReader,
    TiffSlide,
    build_ome_xml,
    get_locs_otsu,
    parse_channel_names,
    read_image,
    write_pyramid,
)


@pytest.fixture(scope="module")
def mif_slide(tmp_path_factory):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (16, 300, 200), dtype=np.uint8)  # C,H,W
    path = tmp_path_factory.mktemp("slides") / "mif.ome.tiff"
    names = [f"marker{i}" for i in range(16)]
    xml = build_ome_xml(200, 300, names, "uint8", physical_size_um=0.5,
                        magnification=20)
    write_pyramid(str(path), data, n_levels=3, tile_size=64, mpp=0.5,
                  ome_xml=xml)
    return str(path), data, names


def test_roundtrip_exact(mif_slide):
    path, data, _ = mif_slide
    ts = TiffSlide(path)
    assert ts.n_channels == 16 and ts.n_levels == 3
    assert ts.level_dimensions == [(200, 300), (100, 150), (50, 75)]
    region = ts.read_region((50, 100), 0, (64, 64))
    np.testing.assert_array_equal(
        region, np.moveaxis(data[:, 100:164, 50:114], 0, -1))
    ts.close()


def test_out_of_bounds_padding(mif_slide):
    path, data, _ = mif_slide
    ts = TiffSlide(path)
    pad = ts.read_region((180, 280), 0, (64, 64))
    assert pad.shape == (64, 64, 16)
    assert pad[20:, 20:].max() == 0
    np.testing.assert_array_equal(
        pad[:20, :20], np.moveaxis(data[:, 280:300, 180:200], 0, -1))
    # fully negative / fully past-the-end
    assert ts.read_region((-64, -64), 0, (32, 32)).max() == 0
    assert ts.read_region((1000, 1000), 0, (32, 32)).max() == 0
    ts.close()


def test_pyramid_level_downsample(mif_slide):
    path, data, _ = mif_slide
    ts = TiffSlide(path)
    lvl1 = ts.read_region((0, 0), 1, ts.level_dimensions[1])
    # level 1 is the 2x mean downsample of level 0
    d = data.astype(np.float32)
    ref = (d[:, 0::2, 0::2] + d[:, 1::2, 0::2] + d[:, 0::2, 1::2]
           + d[:, 1::2, 1::2]) / 4
    ref = np.moveaxis(np.floor(ref).astype(np.uint8)[:, :150, :100], 0, -1)
    # integer mean truncation matches the native kernel
    np.testing.assert_allclose(lvl1.astype(int), ref.astype(int), atol=1)
    ts.close()


def test_ome_metadata(mif_slide):
    path, _, names = mif_slide
    ts = TiffSlide(path)
    desc = ts.description
    assert "OME" in desc
    assert parse_channel_names(desc) == names
    assert ts.mpp == pytest.approx(0.5, rel=1e-4)
    ts.close()


def test_slide_reader_channel_selection(mif_slide):
    path, data, names = mif_slide
    reader = SlideReader(path, channel_idxs=[0, 5, 10], mode="IF")
    assert reader.n_channels == 3
    assert reader.channel_names == ["marker0", "marker5", "marker10"]
    region = reader.read_region((10, 10), 0, (32, 32))
    np.testing.assert_array_equal(
        region, np.moveaxis(data[[0, 5, 10], 10:42, 10:42], 0, -1))
    # thread-pooled batch read
    out = reader.read_regions([(0, 0), (64, 64)], 0, [(32, 32), (32, 32)],
                              num_workers=2)
    assert len(out) == 2 and out[0].shape == (32, 32, 3)
    reader.close()


def test_rgb_interleaved_slide(tmp_path):
    """HWC uint8 RGB written planar -> read back; plus read_image dispatch."""
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (3, 128, 96), dtype=np.uint8)
    path = tmp_path / "he.tiff"
    write_pyramid(str(path), rgb, n_levels=2, tile_size=64)
    ts = TiffSlide(str(path))
    assert ts.n_channels == 3
    arr = read_image(str(path))
    np.testing.assert_array_equal(arr, np.moveaxis(rgb, 0, -1))
    ts.close()


def test_uint16_and_int32_planes(tmp_path):
    rng = np.random.default_rng(2)
    u16 = rng.integers(0, 60000, (2, 80, 70), dtype=np.uint16)
    p1 = tmp_path / "u16.tiff"
    write_pyramid(str(p1), u16, n_levels=2, tile_size=64)
    ts = TiffSlide(str(p1))
    assert ts.dtype == np.uint16
    np.testing.assert_array_equal(
        ts.read_region((0, 0), 0, (70, 80)), np.moveaxis(u16, 0, -1))
    ts.close()

    labels = rng.integers(0, 1 << 20, (1, 64, 64)).astype(np.int32)
    p2 = tmp_path / "labels.tiff"
    write_pyramid(str(p2), labels, n_levels=2, tile_size=64)
    ts = TiffSlide(str(p2))
    assert ts.dtype == np.int32
    np.testing.assert_array_equal(
        ts.read_region((0, 0), 0, (64, 64))[..., 0], labels[0])
    # label pyramid levels use nearest (never averaged labels)
    lvl1 = ts.read_region((0, 0), 1, (32, 32))[..., 0]
    np.testing.assert_array_equal(lvl1, labels[0, 0::2, 0::2])
    ts.close()


def test_get_locs_otsu():
    mask = np.zeros((100, 100), dtype=bool)
    mask[25:75, 25:75] = True
    positions, pcts = get_locs_otsu(mask, slide_dim=(1000, 1000),
                                    tile_size_lvl0=250, mask_thresh=0.1)
    assert len(positions) >= 4
    assert ((positions >= 0) & (positions <= 1000)).all()
    assert (pcts > 0.1).all()


def test_pyramid_writer_banded_bit_identical(tmp_path):
    """Streaming band writer must produce bit-identical files to the
    one-shot write_pyramid across dtypes, and clean up its disk spill
    (VERDICT r1 #4: bounded-memory WSI output)."""
    from mipheivit_tpu.slideio import PyramidWriter

    rng = np.random.default_rng(7)
    cases = [(np.uint8, 3, 301, 200), (np.uint16, 5, 97, 130),
             (np.int32, 1, 64, 64), (np.float32, 2, 50, 70)]
    for dtype, c, h, w in cases:
        data = (rng.random((c, h, w)) * 200).astype(dtype)
        a = tmp_path / f"a_{np.dtype(dtype).name}.tiff"
        b = tmp_path / f"b_{np.dtype(dtype).name}.tiff"
        write_pyramid(str(a), data, n_levels=3, tile_size=32)
        with PyramidWriter(str(b), width=w, height=h, n_channels=c,
                           dtype=dtype, n_levels=3, tile_size=32) as pw:
            y = 0
            while y < h:  # deliberately awkward band height
                bh = min(37, h - y)
                pw.write_band(data[:, y:y + bh])
                y += bh
        assert a.read_bytes() == b.read_bytes()
        ts = TiffSlide(str(b))
        back = ts.read_region((0, 0), 0, (w, h))
        np.testing.assert_array_equal(np.moveaxis(back, -1, 0), data)
        ts.close()
    assert not [f for f in tmp_path.iterdir() if "spill" in f.name]


def test_pyramid_writer_incomplete_raises(tmp_path):
    from mipheivit_tpu.slideio import PyramidWriter

    pw = PyramidWriter(str(tmp_path / "x.tiff"), width=10, height=20,
                       n_channels=1, dtype=np.uint8, n_levels=1)
    pw.write_band(np.zeros((1, 5, 10), np.uint8))
    with pytest.raises(IOError):
        pw.close()


def _save_multipage(path, pages):
    """PIL multipage TIFF: synthesizes vendor page layouts (QPTIFF page
    grouping, SVS/NDPI flat pyramids with label/macro extras)."""
    from PIL import Image

    imgs = [Image.fromarray(p) for p in pages]
    imgs[0].save(str(path), format="TIFF", save_all=True,
                 append_images=imgs[1:])


def test_qptiff_page_area_grouping(tmp_path, rng):
    """QPTIFF-style layout: single-sample pages grouped by area into
    channel-joined levels; RGB thumbnail pages skipped (reference:
    slidevips read_pyramid.py:59-88)."""
    c0 = [rng.integers(0, 255, (120, 100), dtype=np.uint8) for _ in range(3)]
    c1 = [a[::2, ::2].copy() for a in c0]
    thumb = rng.integers(0, 255, (30, 25, 3), dtype=np.uint8)
    path = tmp_path / "fake.qptiff"
    _save_multipage(path, c0 + [thumb] + c1)
    ts = TiffSlide(str(path))
    assert ts.n_channels == 3
    assert ts.level_dimensions == [(100, 120), (50, 60)]
    r = ts.read_region((10, 10), 0, (50, 50))
    np.testing.assert_array_equal(
        r, np.stack([a[10:60, 10:60] for a in c0], -1))
    r1 = ts.read_region((0, 0), 1, (50, 60))
    np.testing.assert_array_equal(r1, np.stack([a[:60, :50] for a in c1], -1))
    ts.close()


def test_flat_pyramid_skips_label_macro_pages(tmp_path, rng):
    """SVS/NDPI vendor pyramids intersperse label/macro photos; pages whose
    aspect ratio differs from level 0 must not become pyramid levels."""
    lvl0 = rng.integers(0, 255, (128, 256, 3), dtype=np.uint8)
    lvl1 = lvl0[::2, ::2].copy()
    label = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)   # square
    macro = rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)
    path = tmp_path / "fake_svs.tiff"
    _save_multipage(path, [lvl0, lvl1, label, macro])
    ts = TiffSlide(str(path))
    assert ts.n_channels == 3
    assert ts.level_dimensions == [(256, 128), (128, 64)]
    np.testing.assert_array_equal(
        ts.read_region((0, 0), 1, (128, 64)), lvl1)
    ts.close()
