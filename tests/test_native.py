"""Tests of the native C++ host-runtime library and its fallbacks."""

import gzip

import numpy as np
import pytest

from photometry_tpu import native_ops


def test_native_builds_and_loads():
    # In this environment g++ exists, so the library must build:
    assert native_ops.native_available()


def test_bswap():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype("<f4")
    raw = x.astype(">f4").tobytes()
    out = native_ops.bswap_f32(raw)
    np.testing.assert_array_equal(out, x)


def test_bswap_crop():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((64, 80)).astype("<f4")
    raw = img.astype(">f4").tobytes()
    out = native_ops.bswap_crop_f32(raw, 64, 80, 10, 50, 4, 76)
    np.testing.assert_array_equal(out, img[10:50, 4:76])


def test_moving_median_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((40, 7)).astype(np.float32)
    x[5, 3] = np.nan
    from photometry_tpu.utils.mathutils import np_moving_median_central
    for w in (3, 5, 9):
        got = native_ops.moving_median_f32(x, w)
        want = np_moving_median_central(x, w, axis=0).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=1e-6, equal_nan=True)


def test_gunzip():
    payload = np.arange(100000, dtype=np.int32).tobytes()
    gz = gzip.compress(payload)
    out = native_ops.gunzip(gz, expected_size=len(payload))
    assert out == payload
    # tiny capacity start still succeeds via retry:
    out = native_ops.gunzip(gz, expected_size=1)
    assert out == payload


def test_gunzip_multimember():
    # pigz/bgzip and appended streams produce multi-member gzip files;
    # gzip.decompress decodes all members, and so must the native path.
    a = b"A" * 1000
    b = b"B" * 2000
    c = b"C" * 300
    gz = gzip.compress(a) + gzip.compress(b) + gzip.compress(c)
    out = native_ops.gunzip(gz, expected_size=len(a) + len(b) + len(c))
    assert out == a + b + c
    # and via a tiny starting capacity (retry loop):
    out = native_ops.gunzip(gz, expected_size=1)
    assert out == a + b + c


def test_gunzip_trailing_garbage_falls_back():
    payload = b"hello world" * 100
    gz = gzip.compress(payload) + b"\x00garbage-not-gzip"
    # gzip.decompress raises on trailing garbage; the native path returns -1
    # and the wrapper falls back — either way we must not silently truncate.
    with pytest.raises(Exception):
        native_ops.gunzip(gz)


def test_gzip_compress_roundtrip_and_determinism():
    """The light-curve product writer's native gzip (libdeflate when built
    with it, stdlib fallback otherwise): valid gzip streams, decodable by
    both the stdlib and the native inflate path, and byte-reproducible
    (MTIME=0) so identical results give identical product files."""
    payload = (b"FITS" * 50000) + bytes(range(256)) * 100
    blob = native_ops.gzip_compress(payload, level=2)
    assert gzip.decompress(blob) == payload
    assert native_ops.gunzip(blob) == payload
    assert blob == native_ops.gzip_compress(payload, level=2)
    # incompressible input must still round-trip (worst-case sizing):
    import numpy as np
    noise = np.random.default_rng(3).integers(0, 256, 300000,
                                              dtype=np.uint8).tobytes()
    blob = native_ops.gzip_compress(noise, level=1)
    assert gzip.decompress(blob) == noise
    # empty payload:
    assert gzip.decompress(native_ops.gzip_compress(b"", level=2)) == b""
