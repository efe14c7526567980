"""GeoTIFF read/write without GDAL.

The reference leans on terra/GDAL for raster I/O (terra::writeRaster V73:1011,
rast() in every example).  This container has no rasterio/GDAL, so this module
implements the needed subset of the format directly:

* writer: single- or multi-band float32 GeoTIFF, strip layout, optional
  deflate compression, ModelPixelScale + ModelTiepoint + a WGS84 GeoKey
  directory, GDAL_NODATA tag (NaN encoded as 'nan');
* reader: classic TIFF (little/big endian), strip or tile layout, compression
  none/deflate/LZW (+ horizontal-differencing predictor), integer and float
  sample formats, GDAL_NODATA mapped to NaN.

A C++ codec for the hot decode path lives in native/ (optional; this module
is the always-available fallback and the format authority for tests).
"""
from __future__ import annotations

import math
import struct
import zlib

import numpy as np

from ..grid import GridSpec, Raster, WGS84

__all__ = ["read_geotiff", "write_geotiff_file"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def write_geotiff_file(path: str, raster: Raster, compress: bool = True, nodata_nan: bool = True):
    """Write a Raster as a float32 GeoTIFF (strip layout, optional deflate)."""
    data = np.asarray(raster.data, np.float32)
    if data.ndim == 2:
        data = data[None]
    nbands, h, w = data.shape
    g = raster.grid
    endian = "<"

    rows_per_strip = max(1, min(h, (1 << 20) // max(w * 4 * nbands, 1)))
    n_strips = math.ceil(h / rows_per_strip)
    chunky = np.moveaxis(data, 0, -1).reshape(h, w * nbands)  # pixel-interleaved
    strips = [
        (zlib.compress(raw, 6) if compress else raw)
        for raw in (
            chunky[s * rows_per_strip : (s + 1) * rows_per_strip].tobytes()
            for s in range(n_strips)
        )
    ]
    counts = [len(s) for s in strips]

    geo_keys = [
        (1, 1, 0, 4),        # version, revision, minor, number of keys
        (1024, 0, 1, 2),     # GTModelTypeGeoKey = geographic
        (1025, 0, 1, 1),     # GTRasterTypeGeoKey = PixelIsArea
        (2048, 0, 1, 4326),  # GeographicTypeGeoKey = WGS84
        (2054, 0, 1, 9102),  # GeogAngularUnitsGeoKey = degree
    ]
    tags = [
        (256, 3, w),
        (257, 3, h),
        (258, 3, [32] * nbands),
        (259, 3, 8 if compress else 1),
        (262, 3, 1),
        (277, 3, nbands),
        (278, 3, rows_per_strip),
        (284, 3, 1),
        (339, 3, [3] * nbands),
        (33550, 12, [g.dx, g.dy, 0.0]),
        (33922, 12, [0.0, 0.0, 0.0, g.xmin, g.ymax, 0.0]),
        (34735, 3, [v for row in geo_keys for v in row]),
        (34737, 2, b"WGS 84|\x00"),
    ]
    if nodata_nan:
        tags.append((42113, 2, b"nan\x00"))

    # serialise tag payloads
    payloads = {}
    for tag, ttype, vals in tags:
        if isinstance(vals, (bytes, bytearray)):
            raw, count = bytes(vals), len(vals)
        else:
            v = list(vals) if isinstance(vals, (list, tuple)) else [vals]
            count = len(v)
            raw = struct.pack(f"{endian}{count}{_TYPE_FMT[ttype]}", *v)
        payloads[tag] = (ttype, count, raw)

    n_entries = len(tags) + 2  # + StripOffsets + StripByteCounts
    ifd_size = 2 + n_entries * 12 + 4
    # external area holds every payload > 4 bytes plus the two strip arrays
    strip_arr = struct.pack(f"{endian}{n_strips}I", *([0] * n_strips))
    ext_size = sum(len(r) + len(r) % 2 for _, _, r in payloads.values() if len(r) > 4)
    ext_size += 2 * (len(strip_arr) + len(strip_arr) % 2) if n_strips > 1 else 0
    strips_start = 8 + ifd_size + ext_size
    offsets = list(np.cumsum([strips_start] + counts[:-1]).astype(int)) if n_strips else []
    payloads[273] = (4, n_strips, struct.pack(f"{endian}{n_strips}I", *offsets))
    payloads[279] = (4, n_strips, struct.pack(f"{endian}{n_strips}I", *counts))

    entries = []
    ext = b""
    ext_pos = 8 + ifd_size
    for tag in sorted(payloads):
        ttype, count, raw = payloads[tag]
        if len(raw) <= 4:
            entries.append(
                struct.pack(f"{endian}HHI", tag, ttype, count) + raw + b"\x00" * (4 - len(raw))
            )
        else:
            entries.append(struct.pack(f"{endian}HHII", tag, ttype, count, ext_pos))
            ext += raw + (b"\x00" if len(raw) % 2 else b"")
            ext_pos += len(raw) + len(raw) % 2
    with open(path, "wb") as f:
        f.write(struct.pack(f"{endian}2sHI", b"II", 42, 8))
        f.write(struct.pack(f"{endian}H", len(entries)))
        for e in entries:
            f.write(e)
        f.write(struct.pack(f"{endian}I", 0))
        f.write(ext)
        for s in strips:
            f.write(s)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (MSB-first, early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table = None
    bitpos = 0
    nbits = 9
    prev = None
    total_bits = len(data) * 8

    def read_code():
        nonlocal bitpos
        if bitpos + nbits > total_bits:
            return EOI
        byte0 = bitpos // 8
        chunk = int.from_bytes(data[byte0 : byte0 + 4].ljust(4, b"\x00"), "big")
        code = (chunk >> (32 - (bitpos % 8) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        return code

    while True:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if table is None:
            raise ValueError("LZW stream missing clear code")
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) + 1 >= (1 << nbits) and nbits < 12:
            nbits += 1
    return bytes(out)


def read_geotiff(path: str, band: int | None = None) -> Raster:
    with open(path, "rb") as f:
        buf = f.read()
    endian = {b"II": "<", b"MM": ">"}.get(buf[:2])
    if endian is None or struct.unpack(f"{endian}H", buf[2:4])[0] != 42:
        raise ValueError(f"{path}: not a classic TIFF")
    (ifd_off,) = struct.unpack(f"{endian}I", buf[4:8])
    (n_entries,) = struct.unpack(f"{endian}H", buf[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, ttype, count = struct.unpack(f"{endian}HHI", buf[off : off + 8])
        size = _TYPE_SIZES.get(ttype, 1) * count
        if size <= 4:
            raw = buf[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(f"{endian}I", buf[off + 8 : off + 12])
            raw = buf[voff : voff + size]
        if ttype == 2:
            tags[tag] = raw.rstrip(b"\x00").decode("latin-1")
        elif ttype in _TYPE_FMT:
            tags[tag] = list(struct.unpack(f"{endian}{count}{_TYPE_FMT[ttype]}", raw))
        elif ttype == 5:  # rational
            v = struct.unpack(f"{endian}{2 * count}I", raw)
            tags[tag] = [v[2 * j] / max(v[2 * j + 1], 1) for j in range(count)]
        else:
            tags[tag] = raw

    w = int(tags[256][0])
    h = int(tags[257][0])
    spp = int(tags.get(277, [1])[0])
    bps = tags.get(258, [1] * spp)
    fmt = tags.get(339, [1] * spp)
    compression = int(tags.get(259, [1])[0])
    predictor = int(tags.get(317, [1])[0])
    planar = int(tags.get(284, [1])[0])
    if planar != 1 and spp > 1:
        raise NotImplementedError("planar configuration 2 not supported")

    kind = {1: "u", 2: "i", 3: "f"}[int(fmt[0])]
    dtype = np.dtype(f"{endian}{kind}{int(bps[0]) // 8}")

    def decode(raw):
        if compression == 1:
            return raw
        if compression in (8, 32946):
            return zlib.decompress(raw)
        if compression == 5:
            return _lzw_decode(raw)
        raise NotImplementedError(f"TIFF compression {compression}")

    # fast path: the C++ threaded decoder for strip layouts (native/)
    if 322 not in tags and compression in (1, 5, 8, 32946):
        try:
            from .native import decode_chunks

            rps = int(tags.get(278, [h])[0])
            offs = np.asarray(tags[273], np.int64)
            cnts = np.asarray(tags[279], np.int64)
            row_bytes = w * spp * dtype.itemsize
            sizes = np.asarray(
                [min(rps, h - s * rps) * row_bytes for s in range(len(offs))], np.int64
            )
            oofs = np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int64)
            blob = decode_chunks(
                buf, offs, cnts, oofs, sizes, compression, predictor,
                row_bytes, dtype.itemsize, int(sizes.sum()),
            )
            if blob is not None:
                out = np.frombuffer(blob, dtype)[: h * w * spp].reshape(h, w, spp).copy()
                if predictor == 2 and dtype.itemsize != 1:
                    out = np.cumsum(out, axis=1, dtype=dtype)
                return _finish_read(out, tags, h, w, spp, endian, band)
        except Exception:  # pragma: no cover - fall back to pure Python
            pass

    out = np.zeros((h, w, spp), dtype)
    if 322 in tags:  # tiled
        tw, th = int(tags[322][0]), int(tags[323][0])
        offs, cnts = tags[324], tags[325]
        tiles_across = math.ceil(w / tw)
        for t, (o, c) in enumerate(zip(offs, cnts)):
            arr = np.frombuffer(decode(buf[int(o) : int(o) + int(c)]), dtype)
            arr = arr.reshape(th, tw, spp)
            if predictor == 2:
                arr = np.cumsum(arr, axis=1, dtype=dtype)
            r0 = (t // tiles_across) * th
            c0 = (t % tiles_across) * tw
            out[r0 : r0 + th, c0 : c0 + tw] = arr[: h - r0, : w - c0]
    else:  # strips
        rps = int(tags.get(278, [h])[0])
        offs, cnts = tags[273], tags[279]
        for s, (o, c) in enumerate(zip(offs, cnts)):
            r0 = s * rps
            rows = min(rps, h - r0)
            arr = np.frombuffer(decode(buf[int(o) : int(o) + int(c)]), dtype)
            arr = arr[: rows * w * spp].reshape(rows, w, spp)
            if predictor == 2:
                arr = np.cumsum(arr, axis=1, dtype=dtype)
            out[r0 : r0 + rows] = arr

    return _finish_read(out, tags, h, w, spp, endian, band)


def _finish_read(out, tags, h, w, spp, endian, band):
    data = np.moveaxis(out, -1, 0).astype(np.float32)
    nodata = tags.get(42113)
    if nodata is not None:
        try:
            nd = float(nodata)
            if not math.isnan(nd):
                data[data == nd] = np.nan
        except ValueError:
            pass

    scale = tags.get(33550, [1.0, 1.0, 0.0])
    tie = tags.get(33922, [0, 0, 0, 0.0, 0.0, 0.0])
    dx, dy = float(scale[0]), float(scale[1])
    xmin = float(tie[3]) - float(tie[0]) * dx
    ymax = float(tie[4]) + float(tie[1]) * dy
    grid = GridSpec(nrows=h, ncols=w, xmin=xmin, ymax=ymax, dx=dx, dy=abs(dy), crs=WGS84)
    if band is not None:
        return Raster(data[band], grid)
    return Raster(data[0] if spp == 1 else data, grid)
