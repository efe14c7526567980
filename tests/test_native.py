"""Native C++ runtime tests (skipped when native/libmachisplin_native.so has
not been built with `make -C native`)."""
import ctypes
import zlib

import numpy as np
import pytest

from machisplin_tpu.io.native import decode_chunks, load_native, tile_plan

native = load_native()
pytestmark = pytest.mark.skipif(native is None, reason="native library not built")


def test_decode_chunks_deflate(rng):
    rows, cols = 37, 53
    data = rng.standard_normal((rows, cols)).astype(np.float32)
    rps = 10
    strips, offs, cnts, oofs, sizes = [], [], [], [], []
    blob = b""
    pos = 0
    out_pos = 0
    for s in range(0, rows, rps):
        raw = data[s : s + rps].tobytes()
        comp = zlib.compress(raw)
        offs.append(pos)
        cnts.append(len(comp))
        oofs.append(out_pos)
        sizes.append(len(raw))
        blob += comp
        pos += len(comp)
        out_pos += len(raw)
    out = decode_chunks(blob, offs, cnts, oofs, sizes, 8, 1, cols * 4, 4, out_pos)
    got = np.frombuffer(out, np.float32).reshape(rows, cols)
    np.testing.assert_array_equal(got, data)


def test_native_lzw_roundtrip_via_python_reference():
    """Encode with a tiny Python TIFF-LZW encoder, decode with the C++ one."""
    from machisplin_tpu.io.geotiff import _lzw_decode

    msg = (b"TOBEORNOTTOBEORTOBEORNOT" * 20)[:400]

    def lzw_encode(data):  # minimal TIFF-LZW encoder for the test
        out_bits = []
        nbits = 9
        table = {bytes([i]): i for i in range(256)}
        next_code = 258

        def put(code):
            out_bits.append((code, nbits))

        put(256)
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                put(table[w])
                table[wc] = next_code
                next_code += 1
                if next_code == (1 << nbits) - 1 and nbits < 12:
                    nbits += 1
                w = bytes([ch])
        if w:
            put(table[w])
        put(257)
        bits = "".join(format(c, f"0{n}b") for c, n in out_bits)
        bits += "0" * (-len(bits) % 8)
        return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))

    enc = lzw_encode(msg)
    assert _lzw_decode(enc) == msg  # python reference agrees
    out = np.zeros(len(msg), np.uint8)
    n = native.tiff_lzw_decode(
        np.frombuffer(enc, np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(enc),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(out),
    )
    assert n == len(msg)
    assert out.tobytes() == msg


def test_tile_plan_matches_python():
    from machisplin_tpu.pipeline.mltps import MLTPSConfig, _tps_tiles
    from machisplin_tpu.grid import GridSpec

    g = GridSpec(nrows=3100, ncols=4200, xmin=-77.7, ymax=-5.8, dx=0.001, dy=0.001)
    cfg = MLTPSConfig()
    n_rx, n_cx, fit_exts, mosaic_exts = _tps_tiles(g, cfg)
    plan = tile_plan(g.extent, g.nrows, g.ncols, cfg.tps_tile_px,
                     cfg.tps_fit_overlap, cfg.tps_mosaic_overlap)
    assert plan.shape == (n_rx * n_cx, 8)
    np.testing.assert_allclose(plan[:, :4], np.asarray(fit_exts), rtol=1e-12)
    np.testing.assert_allclose(plan[:, 4:], np.asarray(mosaic_exts), rtol=1e-12)


def test_reader_uses_native_path(tmp_path, rng):
    """Strip-layout deflate file decodes identically via the native path."""
    import jax.numpy as jnp

    from machisplin_tpu.grid import GridSpec, Raster
    from machisplin_tpu.io.geotiff import read_geotiff, write_geotiff_file

    g = GridSpec(nrows=300, ncols=200, xmin=0, ymax=1, dx=0.01, dy=0.01)
    data = rng.standard_normal((300, 200)).astype(np.float32)
    path = str(tmp_path / "n.tif")
    write_geotiff_file(path, Raster(jnp.asarray(data), g))
    back = read_geotiff(path)
    np.testing.assert_allclose(np.asarray(back.data), data, rtol=1e-7)
