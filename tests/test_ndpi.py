"""NDPI backend: synthetic single-strip restart-marker JPEG fixture.

Builds a real NDPI-style container (classic TIFF, Compression=JPEG,
RowsPerStrip == height, DRI restart markers once per MCU row — the layout
stock libtiff rejects and the reference reads via openslide,
slidevips-python/slidevips/read_pyramid.py:31-40) and drives it through
``SlideReader``: band decode must match a whole-stream decode bit-for-bit
(restart markers reset the DC predictor, so per-band re-assembly is exact).
"""

import io
import struct


import numpy as np
import pytest

from mipheivit_tpu.slideio.ndpi import (
    NdpiSlide, is_ndpi_strip_jpeg, parse_tiff_ifds, _JpegStream)
from mipheivit_tpu.slideio.reader import SlideReader

pytestmark = pytest.mark.tier0


def _restart_jpeg(img: np.ndarray, rows: int = 1) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92,
                              restart_marker_rows=rows)
    return buf.getvalue()


def _write_ndpi(path, jpegs_and_dims, mpp_um=0.45):
    """Classic little-endian TIFF with one single-strip JPEG IFD per level."""
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_offsets = []
    data_blobs = []

    # layout: header | per-level [strip data ... extra arrays ... IFD]
    pos = 8
    for jpeg, (w, h) in jpegs_and_dims:
        strip_off = pos
        pos += len(jpeg)
        bits_off = pos
        pos += 6                       # SHORT[3]
        xres_off = pos
        pos += 8                       # RATIONAL
        ifd_off = pos
        n_entries = 12
        pos += 2 + n_entries * 12 + 4
        ifd_offsets.append(ifd_off)
        data_blobs.append((jpeg, strip_off, bits_off, xres_off, w, h))

    def entry(tag, typ, count, value_bytes):
        return struct.pack("<HHI", tag, typ, count) + value_bytes

    body = bytearray()
    for li, (jpeg, strip_off, bits_off, xres_off, w, h) in enumerate(data_blobs):
        body += jpeg
        body += struct.pack("<HHH", 8, 8, 8)
        # XResolution: pixels per cm for mpp -> 10000/mpp per cm
        per_cm = int(round(10000.0 / mpp_um))
        body += struct.pack("<II", per_cm, 1)
        nxt = ifd_offsets[li + 1] if li + 1 < len(ifd_offsets) else 0
        ifd = bytearray()
        entries = [
            entry(254, 4, 1, struct.pack("<I", 0 if li == 0 else 1)),
            entry(256, 4, 1, struct.pack("<I", w)),
            entry(257, 4, 1, struct.pack("<I", h)),
            entry(258, 3, 3, struct.pack("<I", bits_off)),
            entry(259, 3, 1, struct.pack("<HH", 7, 0)),
            entry(262, 3, 1, struct.pack("<HH", 6, 0)),
            entry(273, 4, 1, struct.pack("<I", strip_off)),
            entry(277, 3, 1, struct.pack("<HH", 3, 0)),
            entry(278, 4, 1, struct.pack("<I", h)),
            entry(279, 4, 1, struct.pack("<I", len(jpeg))),
            entry(282, 5, 1, struct.pack("<I", xres_off)),
            entry(296, 3, 1, struct.pack("<HH", 3, 0)),
        ]
        assert len(entries) == 12
        ifd += struct.pack("<H", len(entries))
        for e in entries:
            ifd += e
        ifd += struct.pack("<I", nxt)
        body += ifd
    out[4:8] = struct.pack("<I", ifd_offsets[0])
    out += body
    with open(path, "wb") as f:
        f.write(out)


@pytest.fixture
def ndpi_fixture(tmp_path, rng):
    w, h = 96, 64
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    jpeg0 = _restart_jpeg(img, rows=1)
    img1 = img[::2, ::2]
    jpeg1 = _restart_jpeg(img1, rows=1)
    path = tmp_path / "synthetic.ndpi"
    _write_ndpi(path, [(jpeg0, (w, h)), (jpeg1, (w // 2, h // 2))])
    return str(path), jpeg0, (w, h)


def test_parse_and_detect(ndpi_fixture):
    path, jpeg0, (w, h) = ndpi_fixture
    ifds = parse_tiff_ifds(path)
    assert len(ifds) == 2
    assert ifds[0][256] == w and ifds[0][257] == h
    assert is_ndpi_strip_jpeg(path)
    st = _JpegStream(jpeg0)
    assert st.dri > 0
    assert st.rows_per_segment() in (8, 16)
    assert len(st.segments) >= h // 16


def test_ndpi_read_region_matches_full_decode(ndpi_fixture):
    import cv2

    path, jpeg0, (w, h) = ndpi_fixture
    full = cv2.imdecode(np.frombuffer(jpeg0, np.uint8), cv2.IMREAD_COLOR)
    full = full[..., ::-1]
    slide = NdpiSlide(path)
    assert slide.dimensions == (w, h)
    assert slide.n_levels == 2
    assert slide.mpp == pytest.approx(0.45, rel=0.01)

    # interior band-aligned and unaligned reads
    for (x, y, rw, rh) in ((0, 0, w, h), (16, 8, 48, 24), (5, 3, 40, 33)):
        got = slide.read_region((x, y), 0, (rw, rh))
        np.testing.assert_array_equal(got, full[y:y + rh, x:x + rw])

    # level 1
    got1 = slide.read_region((0, 0), 1, (w // 2, h // 2))
    assert got1.shape == (h // 2, w // 2, 3)
    slide.close()


def _zero_sof_dims(jpeg: bytes) -> bytes:
    """Simulate the gigapixel NDPI quirk: width/height 0 in the SOF
    header (planes >65535 px cannot fit the 16-bit field)."""
    st = _JpegStream(jpeg)
    out = bytearray(jpeg)
    out[st.sof_height_off:st.sof_height_off + 4] = b"\0\0\0\0"
    return bytes(out)


def test_ndpi_zero_sof_dims_reads_from_tags(tmp_path, rng):
    """Width/height come from the TIFF tags when the SOF stores 0 —
    the layout of every real 40x base plane (ADVICE r3 high)."""
    import cv2

    w, h = 96, 64
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    jpeg = _restart_jpeg(img, rows=1)
    full = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    full = full[..., ::-1]
    path = tmp_path / "zerosof.ndpi"
    _write_ndpi(path, [(_zero_sof_dims(jpeg), (w, h))])
    slide = NdpiSlide(path)
    assert slide.dimensions == (w, h)
    st = slide._stream(0)
    assert st.sof_width == 0 and st.width == w
    assert st.rows_per_segment() is not None   # no ZeroDivisionError
    for (x, y, rw, rh) in ((0, 0, w, h), (5, 3, 40, 33)):
        got = slide.read_region((x, y), 0, (rw, rh))
        np.testing.assert_array_equal(got, full[y:y + rh, x:x + rw])
    slide.close()


def test_ndpi_wide_plane_chunk_decode(tmp_path, rng):
    """Per-restart-segment rectangular decode for planes wider than the
    SOF limit: force the wide path on a small plane whose DRI subdivides
    the MCU row (4:4:4 so no chroma-seam tolerance is needed)."""
    import io

    import cv2
    from PIL import Image

    w, h = 96, 64
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    # dri=4 MCUs -> 3 chunks of 32 px per 12-MCU row
    Image.fromarray(img).save(buf, "JPEG", quality=92, subsampling=0,
                              restart_marker_blocks=4)
    jpeg = buf.getvalue()
    full = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    full = full[..., ::-1]
    path = tmp_path / "wide.ndpi"
    _write_ndpi(path, [(_zero_sof_dims(jpeg), (w, h))])
    slide = NdpiSlide(path)
    slide._max_band_px = 33            # 96 > 33 -> wide path; chunk_w=32 ok
    st = slide._stream(0)
    assert st.segs_per_row() == 3 and st.rows_per_segment() is None
    for (x, y, rw, rh) in ((0, 0, w, h), (16, 8, 48, 24), (37, 5, 45, 50),
                           (80, 48, 32, 32)):   # past-edge padded read
        got = slide.read_region((x, y), 0, (rw, rh))
        vy, vx = min(h - y, rh), min(w - x, rw)
        np.testing.assert_array_equal(got[:vy, :vx],
                                      full[y:y + vy, x:x + vx])
        assert (got[vy:] == 0).all() and (got[:, vx:] == 0).all()
    slide.close()


def test_ndpi_wide_plane_bad_dri_raises(tmp_path, rng):
    """A wide plane whose DRI does not subdivide the MCU row raises a
    clear IOError instead of ZeroDivisionError."""
    import io

    from PIL import Image

    w, h = 96, 64
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92, subsampling=0,
                              restart_marker_blocks=5)   # 5 does not divide 12
    path = tmp_path / "baddri.ndpi"
    _write_ndpi(path, [(_zero_sof_dims(buf.getvalue()), (w, h))])
    slide = NdpiSlide(path)
    slide._max_band_px = 33
    with pytest.raises(IOError, match="restart interval"):
        slide.read_region((0, 0), 0, (32, 32))
    slide.close()


def test_ndpi_padded_reads_and_reader(ndpi_fixture):
    import cv2

    path, jpeg0, (w, h) = ndpi_fixture
    full = cv2.imdecode(np.frombuffer(jpeg0, np.uint8), cv2.IMREAD_COLOR)
    full = full[..., ::-1]
    reader = SlideReader(path)
    assert reader.dimensions == (w, h)
    out = reader.read_region((-8, -8), 0, (32, 32))
    assert out.shape == (32, 32, 3)
    assert (out[:8] == 0).all() and (out[:, :8] == 0).all()
    np.testing.assert_array_equal(out[8:, 8:], full[:24, :24])
    out2 = reader.read_region((w - 16, h - 16), 0, (32, 32))
    assert (out2[16:] == 0).all() and (out2[:, 16:] == 0).all()
    reader.close()


def test_parse_tiff_ifds_rejects_cyclic_chain(tmp_path):
    """A malformed TIFF whose IFD next-pointer cycles must raise a clear
    IOError instead of looping forever."""
    # classic TIFF header -> IFD at 8 with 0 entries and next_off -> itself
    buf = struct.pack("<2sHI", b"II", 42, 8) + struct.pack("<HI", 0, 8)
    path = tmp_path / "cycle.tiff"
    path.write_bytes(buf)
    with pytest.raises(IOError, match="cyclic|runaway"):
        parse_tiff_ifds(str(path))


def test_parse_tiff_ifds_fuzz_no_hang(tmp_path, rng):
    """Random garbage after a valid TIFF magic: parsing must terminate
    (any exception is fine, hangs and segfaults are not)."""
    for i in range(25):
        blob = b"II*\x00" + rng.integers(0, 256, 256, dtype=np.uint8) \
            .tobytes()
        path = tmp_path / f"fuzz{i}.tiff"
        path.write_bytes(blob)
        try:
            parse_tiff_ifds(str(path))
        except Exception:
            pass
