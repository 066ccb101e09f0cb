"""NDPI (Hamamatsu) slide backend: restart-marker JPEG band decoding.

NDPI files are TIFF-like containers whose levels are stored as a *single
JPEG strip* (RowsPerStrip == ImageLength) with DRI restart markers emitted
once per MCU row — out of spec for stock libtiff, which is why the native
engine cannot read them (the reference opens NDPI through openslide —
slidevips-python/slidevips/read_pyramid.py:31-40). This backend implements
the openslide approach in pure Python:

  * the TIFF IFD chain is parsed directly (classic + BigTIFF), no libtiff;
  * each level's JPEG stream is scanned once for its restart-marker
    offsets (entropy-coded segments, one MCU row each);
  * ``read_region`` re-assembles a tiny valid JPEG for just the MCU rows
    that cover the request — original header with the SOF height patched,
    the selected entropy segments with renumbered RST markers, EOI — and
    decodes it with OpenCV's libjpeg. Random access without ever decoding
    the gigapixel plane.

Levels without restart markers fall back to a whole-strip decode with an
LRU cache (fine for thumbnails/macro pages).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

# TIFF tag ids
_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_DESCRIPTION = 270
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_XRES = 282
_TAG_RESUNIT = 296
_TAG_JPEG_TABLES = 347
_TAG_NDPI_MAGNIFICATION = 65421

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}


def parse_tiff_ifds(path: str) -> List[Dict[int, object]]:
    """Minimal IFD walk returning {tag: value} dicts per directory."""
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:2] == b"II":
            endian = "<"
        elif head[:2] == b"MM":
            endian = ">"
        else:
            raise IOError(f"{path}: not a TIFF container")
        magic = struct.unpack(endian + "H", head[2:4])[0]
        big = magic == 43
        if big:
            f.seek(8)
            next_off = struct.unpack(endian + "Q", f.read(8))[0]
        elif magic == 42:
            next_off = struct.unpack(endian + "I", head[4:8])[0]
        else:
            raise IOError(f"{path}: bad TIFF magic {magic}")

        ifds = []
        while next_off:
            f.seek(next_off)
            if big:
                n = struct.unpack(endian + "Q", f.read(8))[0]
                entry_size, cnt_fmt = 20, "Q"
            else:
                n = struct.unpack(endian + "H", f.read(2))[0]
                entry_size, cnt_fmt = 12, "I"
            raw = f.read(entry_size * n)
            tags: Dict[int, object] = {}
            for i in range(n):
                e = raw[i * entry_size:(i + 1) * entry_size]
                tag, typ = struct.unpack(endian + "HH", e[:4])
                count = struct.unpack(endian + cnt_fmt, e[4:4 + (8 if big else 4)])[0]
                inline = e[4 + (8 if big else 4):]
                size = _TYPE_SIZES.get(typ, 1) * count
                if size <= len(inline):
                    data = inline[:size]
                else:
                    off = struct.unpack(endian + cnt_fmt, inline)[0]
                    pos = f.tell()
                    f.seek(off)
                    data = f.read(size)
                    f.seek(pos)
                tags[tag] = _decode_tag(endian, typ, count, data)
            next_off = struct.unpack(endian + cnt_fmt,
                                     f.read(8 if big else 4))[0]
            ifds.append(tags)
        return ifds


def _decode_tag(endian, typ, count, data):
    if typ == 2:                                     # ASCII
        return data.split(b"\0")[0].decode("latin-1", "replace")
    fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
           12: "d", 16: "Q", 17: "q"}.get(typ)
    if fmt:
        vals = struct.unpack(endian + fmt * count, data[:struct.calcsize(fmt) * count])
        return vals[0] if count == 1 else list(vals)
    if typ in (5, 10):                               # RATIONAL
        f2 = "I" if typ == 5 else "i"
        vals = struct.unpack(endian + f2 * (2 * count), data)
        out = [vals[2 * i] / max(vals[2 * i + 1], 1) for i in range(count)]
        return out[0] if count == 1 else out
    return data


class _JpegStream:
    """Marker map of one single-strip JPEG: header span, SOF height patch
    offset, MCU geometry, restart-segment spans inside the entropy data."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.dri = 0
        self.height = 0
        self.width = 0
        self.ncomp = 1
        self.sof_height_off = None
        max_h = max_v = 1
        i = 2                                         # skip SOI
        n = len(buf)
        while i < n - 1:
            if buf[i] != 0xFF:
                raise IOError("bad JPEG structure in NDPI strip")
            marker = buf[i + 1]
            if marker == 0xD8:
                i += 2
                continue
            seg_len = struct.unpack(">H", buf[i + 2:i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2):
                self.sof_height_off = i + 5
                self.height, self.width = struct.unpack(
                    ">HH", buf[i + 5:i + 9])
                self.ncomp = buf[i + 9]
                for c in range(self.ncomp):
                    hv = buf[i + 10 + 3 * c + 1]
                    max_h = max(max_h, hv >> 4)
                    max_v = max(max_v, hv & 0xF)
            elif marker == 0xDD:
                self.dri = struct.unpack(">H", buf[i + 4:i + 6])[0]
            elif marker == 0xDA:
                self.header_end = i + 2 + seg_len
                break
            i += 2 + seg_len
        else:
            raise IOError("no SOS marker in NDPI strip")
        self.mcu_w = 8 * max_h
        self.mcu_h = 8 * max_v
        self.segments: List[Tuple[int, int]] = []
        self._scan_entropy()

    def _scan_entropy(self):
        buf = self.buf
        start = self.header_end
        i = start
        n = len(buf)
        arr = np.frombuffer(buf, np.uint8)
        ff = np.flatnonzero(arr[start:-1] == 0xFF) + start
        nxt = arr[ff + 1]
        specials = ff[(nxt >= 0xD0) & (nxt <= 0xD9)]
        seg_start = start
        for pos in specials:
            m = buf[pos + 1]
            if 0xD0 <= m <= 0xD7:
                self.segments.append((seg_start, pos))
                seg_start = pos + 2
            elif m == 0xD9:
                self.segments.append((seg_start, pos))
                seg_start = None
                break
        if seg_start is not None and seg_start < n:
            self.segments.append((seg_start, n))
        del i

    def rows_per_segment(self) -> Optional[int]:
        if not self.dri:
            return None
        mcus_per_row = -(-self.width // self.mcu_w)
        if self.dri % mcus_per_row:
            return None
        return (self.dri // mcus_per_row) * self.mcu_h

    def band_jpeg(self, seg0: int, seg1: int, band_rows: int,
                  width_hint: int = 0) -> bytes:
        """Valid standalone JPEG for entropy segments [seg0, seg1)."""
        parts = [bytearray(self.buf[:self.header_end])]
        parts[0][self.sof_height_off:self.sof_height_off + 2] = \
            struct.pack(">H", band_rows)
        if self.width == 0 and 0 < width_hint <= 0xFFFF:
            # huge NDPI planes store width 0 in the SOF header
            parts[0][self.sof_height_off + 2:self.sof_height_off + 4] = \
                struct.pack(">H", width_hint)
        for j, (s, e) in enumerate(self.segments[seg0:seg1]):
            if j > 0:
                parts.append(bytes((0xFF, 0xD0 + ((j - 1) % 8))))
            parts.append(self.buf[s:e])
        parts.append(b"\xff\xd9")
        return b"".join(bytes(p) for p in parts)


class NdpiSlide:
    """TiffSlide-interface backend for NDPI files (see module docstring)."""

    def __init__(self, path: str):
        self.path = str(path)
        ifds = parse_tiff_ifds(self.path)
        # pyramid levels only: NDPI marks macro/map pages with a negative
        # SourceLens (tag 65421); keep every positive-lens strip directory.
        levels = []
        for t in ifds:
            if _TAG_STRIP_OFFSETS not in t or not t.get(_TAG_WIDTH, 0):
                continue
            lens = t.get(_TAG_NDPI_MAGNIFICATION)
            if lens is not None and _as_scalar(lens) < 0:
                continue
            levels.append(t)
        if not levels:
            raise IOError(f"{path}: no image directories")
        levels.sort(key=lambda t: -int(t[_TAG_WIDTH]))
        self._levels = levels
        self._file = open(self.path, "rb")
        self._streams: Dict[int, _JpegStream] = {}
        self._full_cache: Dict[int, np.ndarray] = {}

        w0, h0 = int(levels[0][_TAG_WIDTH]), int(levels[0][_TAG_HEIGHT])
        self.dimensions = (w0, h0)
        self.level_dimensions = [
            (int(t[_TAG_WIDTH]), int(t[_TAG_HEIGHT])) for t in levels]
        self.n_levels = len(levels)
        samples = levels[0].get(_TAG_SAMPLES, 3)
        self.n_channels = int(samples if np.isscalar(samples) else samples[0])
        self.dtype = np.uint8
        self.description = str(levels[0].get(_TAG_DESCRIPTION, ""))
        self.mpp = self._compute_mpp(levels[0])

    def _compute_mpp(self, tags) -> Optional[float]:
        xres = tags.get(_TAG_XRES)
        if not xres:
            return None
        unit = tags.get(_TAG_RESUNIT, 2)
        per_um = {2: xres / 25400.0, 3: xres / 10000.0}.get(unit)
        if not per_um:
            return None
        return 1.0 / per_um if per_um > 0 else None

    # -- decoding ---------------------------------------------------------
    def _strip_bytes(self, level: int) -> bytes:
        tags = self._levels[level]
        off = tags[_TAG_STRIP_OFFSETS]
        cnt = tags[_TAG_STRIP_COUNTS]
        off = off if np.isscalar(off) else off[0]
        cnt = cnt if np.isscalar(cnt) else cnt[0]
        self._file.seek(int(off))
        data = self._file.read(int(cnt))
        tables = tags.get(_TAG_JPEG_TABLES)
        if isinstance(tables, (bytes, bytearray)) and len(tables) > 4 \
                and not _has_tables(data):
            # abbreviated stream: splice the shared tables after SOI
            data = data[:2] + bytes(tables)[2:-2] + data[2:]
        return data

    def _stream(self, level: int) -> _JpegStream:
        st = self._streams.get(level)
        if st is None:
            st = _JpegStream(self._strip_bytes(level))
            self._streams[level] = st
        return st

    def _decode(self, jpeg: bytes) -> np.ndarray:
        import cv2

        arr = cv2.imdecode(np.frombuffer(jpeg, np.uint8),
                           cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise IOError(f"{self.path}: JPEG band decode failed")
        if arr.ndim == 2:
            arr = arr[..., None]
        elif arr.shape[-1] == 3:
            arr = arr[..., ::-1]                      # BGR -> RGB
        return arr

    def _read_rows(self, level: int, y0: int, y1: int) -> Tuple[np.ndarray, int]:
        """Decoded rows covering [y0, y1); returns (array, first_row)."""
        w, h = self.level_dimensions[level]
        st = self._stream(level)
        rps = st.rows_per_segment()
        if rps is None or not st.segments or len(st.segments) < 2:
            arr = self._full_cache.get(level)
            if arr is None:
                arr = self._decode(st.buf)
                self._full_cache[level] = arr
            return arr, 0
        # One MCU row of margin each side: libjpeg's fancy chroma
        # upsampling interpolates across MCU-row boundaries, so rows at a
        # band edge only match the whole-plane decode when their true
        # neighbor rows are present in the band.
        seg0 = max(0, y0 // rps - 1)
        seg1 = min(-(-y1 // rps) + 1, len(st.segments))
        band_rows = min(seg1 * rps, h) - seg0 * rps
        jpeg = st.band_jpeg(seg0, seg1, band_rows)
        return self._decode(jpeg), seg0 * rps

    def read_region(self, location: Tuple[int, int], level: int,
                    size: Tuple[int, int]) -> np.ndarray:
        x, y = int(location[0]), int(location[1])
        wreq, hreq = int(size[0]), int(size[1])
        w, h = self.level_dimensions[level]
        out = np.zeros((hreq, wreq, self.n_channels), np.uint8)
        y0 = max(0, y)
        y1 = min(h, y + hreq)
        x0 = max(0, x)
        x1 = min(w, x + wreq)
        if y1 > y0 and x1 > x0:
            band, first = self._read_rows(level, y0, y1)
            sub = band[y0 - first:y1 - first, x0:x1]
            out[y0 - y:y0 - y + sub.shape[0],
                x0 - x:x0 - x + sub.shape[1]] = sub[..., :self.n_channels]
        return out

    def close(self):
        if getattr(self, "_file", None):
            self._file.close()
            self._file = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _as_scalar(v) -> float:
    """First element of a possibly-list tag value."""
    return float(v[0]) if isinstance(v, (list, tuple)) else float(v)


def _has_tables(jpeg: bytes) -> bool:
    """True if the stream carries its own DQT before SOS."""
    i = 2
    while i < len(jpeg) - 3:
        if jpeg[i] != 0xFF:
            return False
        m = jpeg[i + 1]
        if m == 0xDB:
            return True
        if m == 0xDA:
            return False
        i += 2 + struct.unpack(">H", jpeg[i + 2:i + 4])[0]
    return False


def is_ndpi_strip_jpeg(path: str) -> bool:
    """True when any level is a single-strip JPEG (libtiff-hostile NDPI)."""
    try:
        ifds = parse_tiff_ifds(path)
    except Exception:
        return False
    for t in ifds:
        if t.get(_TAG_COMPRESSION) in (6, 7) \
                and int(t.get(_TAG_ROWS_PER_STRIP, 0) or 0) \
                >= int(t.get(_TAG_HEIGHT, 1) or 1) \
                and t.get(_TAG_WIDTH, 0) >= 64:
            return True
    return False
