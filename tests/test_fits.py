"""Tests of the dependency-free FITS reader/writer."""

import numpy as np
import pytest

from photometry_tpu.io import fits as pf


def test_image_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((16, 12)).astype(np.float32)
    hdr = pf.Header()
    hdr.set("SECTOR", 1, "TESS sector")
    hdr.set("CAMERA", 3)
    hdr.set("BJDREFI", 2457000, "integer part of BJD reference")
    hdr.set("OBJECT", "TIC 260795451")
    hdr.set("TSTART", 1325.2934258, "observation start")
    hdr.set("GOODBOOL", True)
    path = tmp_path / "img.fits"
    pf.write_fits(path, [pf.PrimaryHDU(img, header=hdr)])
    hdus = pf.read_fits(path)
    assert len(hdus) == 1
    np.testing.assert_array_equal(hdus[0].data, img)
    h = hdus[0].header
    assert h["SECTOR"] == 1
    assert h["OBJECT"] == "TIC 260795451"
    assert h["TSTART"] == pytest.approx(1325.2934258)
    assert h["GOODBOOL"] is True
    assert h.comment("SECTOR") == "TESS sector"


def test_gzip_roundtrip(tmp_path):
    img = np.arange(64, dtype=np.int32).reshape(8, 8)
    path = tmp_path / "img.fits.gz"
    pf.write_fits(path, [pf.PrimaryHDU(img)])
    hdus = pf.read_fits(path)
    np.testing.assert_array_equal(hdus[0].data, img)


def test_multi_hdu_and_int_dtypes(tmp_path):
    prim = pf.PrimaryHDU(None)
    a = (np.arange(20, dtype=np.int16) - 5).reshape(4, 5)
    b = np.arange(12, dtype=np.float64).reshape(3, 4) * 1e-7
    path = tmp_path / "multi.fits"
    pf.write_fits(path, [prim, pf.ImageHDU(a, name="APERTURE"), pf.ImageHDU(b, name="SUMIMAGE")])
    hdus = pf.read_fits(path)
    assert len(hdus) == 3
    assert hdus[0].data is None
    assert hdus[1].name == "APERTURE"
    np.testing.assert_array_equal(hdus[1].data, a)
    np.testing.assert_allclose(hdus[2].data, b, rtol=1e-12)


def test_bintable_roundtrip(tmp_path):
    n = 7
    cols = {
        "TIME": np.linspace(1325.0, 1353.0, n).astype(np.float64),
        "CADENCENO": np.arange(n, dtype=np.int32),
        "FLUX_RAW": np.linspace(100, 200, n).astype(np.float32),
        "QUALITY": np.array([0, 1, 0, 4096, 0, 2, 0], dtype=np.int32),
        "POS_CORR": np.arange(2 * n, dtype=np.float32).reshape(n, 2),
        "LABEL": np.array([f"star{i}" for i in range(n)]),
    }
    hdr = pf.Header()
    hdr.set("TICID", 260795451)
    path = tmp_path / "lc.fits.gz"
    pf.write_fits(path, [pf.PrimaryHDU(None), pf.BinTableHDU(cols, header=hdr, name="LIGHTCURVE")])
    hdus = pf.read_fits(path)
    t = hdus[1]
    assert t.kind == "bintable"
    assert t.name == "LIGHTCURVE"
    assert t.header["TICID"] == 260795451
    assert t.columns() == list(cols.keys())
    np.testing.assert_allclose(t.data["TIME"], cols["TIME"], rtol=1e-14)
    np.testing.assert_array_equal(t.data["CADENCENO"], cols["CADENCENO"])
    np.testing.assert_allclose(t.data["FLUX_RAW"], cols["FLUX_RAW"], rtol=1e-7)
    np.testing.assert_array_equal(t.data["QUALITY"], cols["QUALITY"])
    assert t.data["POS_CORR"].shape == (n, 2)
    np.testing.assert_allclose(t.data["POS_CORR"], cols["POS_CORR"])
    assert list(t.data["LABEL"]) == [f"star{i}" for i in range(n)]


def test_tdim_3d_column(tmp_path):
    n = 4
    cols = {"WEIGHTMAP": np.arange(n * 3 * 5, dtype=np.float32).reshape(n, 3, 5)}
    path = tmp_path / "wm.fits"
    pf.write_fits(path, [pf.PrimaryHDU(None), pf.BinTableHDU(cols, name="WM")])
    t = pf.read_fits(path)[1]
    assert t.data["WEIGHTMAP"].shape == (n, 3, 5)
    np.testing.assert_allclose(t.data["WEIGHTMAP"], cols["WEIGHTMAP"])


def test_string_value_with_quote(tmp_path):
    hdr = pf.Header()
    hdr.set("NOTE", "it's fine / really")
    path = tmp_path / "q.fits"
    pf.write_fits(path, [pf.PrimaryHDU(np.zeros((2, 2), np.float32), header=hdr)])
    h = pf.read_fits(path)[0].header
    assert h["NOTE"] == "it's fine / really"


def test_unsigned_int_convention(tmp_path):
    # 16-bit unsigned via BZERO=32768 is the TESS raw-pixel convention.
    raw = np.array([[0, 1000], [40000, 65535]], dtype=np.uint16)
    signed = (raw.astype(np.int32) - 32768).astype(np.int16)
    hdr = pf.Header()
    hdr.set("BZERO", 32768)
    hdr.set("BSCALE", 1)
    path = tmp_path / "u16.fits"
    pf.write_fits(path, [pf.PrimaryHDU(signed, header=hdr)])
    out = pf.read_fits(path)[0].data
    np.testing.assert_array_equal(out, raw.astype(np.int64))


def test_checksums_written_and_verified(tmp_path):
    """Every written HDU carries valid CHECKSUM/DATASUM (reference writes
    them via astropy, BasePhotometry.py:1720-1722)."""
    import gzip
    from photometry_tpu.io.fits import (write_fits, verify_checksums,
                                        PrimaryHDU, ImageHDU, BinTableHDU,
                                        Header, read_fits)
    p = str(tmp_path / "c.fits.gz")
    hdr = Header()
    hdr.set("OBJECT", "TIC 1", "target")
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    tbl = {"TIME": np.linspace(0, 1, 5), "FLUX": np.arange(5, dtype=np.float32)}
    write_fits(p, [PrimaryHDU(None, header=hdr), ImageHDU(img, name="IMG"),
                   BinTableHDU(tbl, name="TBL")])
    res = verify_checksums(p)
    assert len(res) == 3
    assert all(r["checksum_ok"] and r["datasum_ok"] for r in res)
    hdus = read_fits(p)
    for h in hdus:
        assert len(str(h.header["CHECKSUM"])) == 16
        int(str(h.header["DATASUM"]))  # decimal string

    # Any data corruption must be detected:
    raw = bytearray(gzip.open(p, "rb").read())
    raw[2880 * 2 + 33] ^= 0x55    # inside the IMG data block
    p2 = str(tmp_path / "bad.fits")
    with open(p2, "wb") as fh:
        fh.write(bytes(raw))
    res2 = verify_checksums(p2)
    assert res2[1]["checksum_ok"] is False
    assert res2[1]["datasum_ok"] is False


def test_checksum_all_ones_property():
    """Any HDU rendered with checksums sums to 0xFFFFFFFF (the defining
    property of the Seaman-Pence encoding), for arbitrary header/data."""
    from photometry_tpu.io.fits import (_hdu_bytes_with_checksum,
                                        _ones_complement_sum,
                                        _encode_checksum, Header)
    rng = np.random.default_rng(3)
    for trial in range(40):
        hdr = Header()
        hdr.set("SIMPLE", True)
        hdr.set("BITPIX", 8)
        hdr.set("NAXIS", 1)
        hdr.set("NAXIS1", int(rng.integers(1, 5000)))
        hdr.set("RANDKEY", float(rng.normal() * 1e6))
        data = rng.integers(0, 256, int(hdr["NAXIS1"]), dtype=np.uint8).tobytes()
        data += b"\x00" * ((-len(data)) % 2880)
        blob = _hdu_bytes_with_checksum(hdr, data)
        assert _ones_complement_sum(blob) == 0xFFFFFFFF
    # encoded strings are always 16 alphanumeric chars:
    for value in [0, 1, 0xFFFFFFFF] + list(rng.integers(0, 2 ** 32, 20)):
        enc = _encode_checksum(int(value))
        assert len(enc) == 16 and all(c.isalnum() for c in enc)


def test_unsigned_convention_tzero_column(tmp_path):
    """TZERO=2^(bits-1) unsigned-int columns must promote, not raise
    OverflowError under NumPy 2 / NEP 50 (round-3 review find)."""
    import numpy as np
    from photometry_tpu.io import fits as pf
    # hand-build a table with TZERO via header injection on write is not
    # supported (writer drops scaling keys), so craft the raw HDU bytes:
    hdr = pf.Header()
    hdr.set("XTENSION", "BINTABLE")
    hdr.set("BITPIX", 8)
    hdr.set("NAXIS", 2)
    hdr.set("NAXIS1", 2)
    hdr.set("NAXIS2", 3)
    hdr.set("PCOUNT", 0)
    hdr.set("GCOUNT", 1)
    hdr.set("TFIELDS", 1)
    hdr.set("TTYPE1", "U16")
    hdr.set("TFORM1", "I")
    hdr.set("TZERO1", 32768)
    raw_vals = np.array([-32768, 0, 32767], ">i2")  # unsigned 0, 32768, 65535
    prim = pf.Header(); prim.set("SIMPLE", True); prim.set("BITPIX", 8); prim.set("NAXIS", 0)
    blob = prim.to_bytes() + hdr.to_bytes() + raw_vals.tobytes()
    blob += b"\0" * ((-len(raw_vals.tobytes())) % 2880)
    p = tmp_path / "u16.fits"
    p.write_bytes(blob)
    hdus = pf.read_fits(str(p))
    col = hdus[1].data["U16"]
    np.testing.assert_array_equal(col, [0, 32768, 65535])


def test_logical_column_ascii_roundtrip(tmp_path):
    """FITS logicals are ASCII 'T'/'F' — a standard file's False must not
    read back True, and our writer must emit the standard encoding."""
    import numpy as np
    from photometry_tpu.io import fits as pf
    vals = np.array([True, False, True, False])
    p = str(tmp_path / "l.fits")
    pf.write_fits(p, [pf.PrimaryHDU(),
                      pf.BinTableHDU({"FLAG": vals}, name="T")])
    raw = open(p, "rb").read()
    assert b"T" in raw and b"F" in raw
    back = pf.read_fits(p)[1].data["FLAG"]
    np.testing.assert_array_equal(back, vals)
    # astropy agrees with our encoding:
    try:
        from astropy.io import fits as apfits
    except ImportError:
        return
    with apfits.open(p) as h:
        np.testing.assert_array_equal(np.asarray(h[1].data["FLAG"], bool), vals)


def test_pcount_heap_skipped(tmp_path):
    """A BINTABLE with PCOUNT heap bytes must not desync the HDU stream."""
    import numpy as np
    from photometry_tpu.io import fits as pf
    hdr = pf.Header()
    hdr.set("XTENSION", "BINTABLE")
    hdr.set("BITPIX", 8)
    hdr.set("NAXIS", 2)
    hdr.set("NAXIS1", 8)
    hdr.set("NAXIS2", 2)
    hdr.set("PCOUNT", 16)      # 16 heap bytes follow the fixed table
    hdr.set("GCOUNT", 1)
    hdr.set("TFIELDS", 1)
    hdr.set("TTYPE1", "VARR")
    hdr.set("TFORM1", "1PE(4)")
    desc = np.array([[2, 0], [2, 8]], ">i4")
    heap = np.arange(4, dtype=">f4").tobytes()
    prim = pf.Header(); prim.set("SIMPLE", True); prim.set("BITPIX", 8); prim.set("NAXIS", 0)
    tail_hdr = pf.Header()
    tail_hdr.set("XTENSION", "IMAGE"); tail_hdr.set("BITPIX", 8)
    tail_hdr.set("NAXIS", 0); tail_hdr.set("PCOUNT", 0); tail_hdr.set("GCOUNT", 1)
    tail_hdr.set("EXTNAME", "TAIL")
    data = desc.tobytes() + heap
    blob = (prim.to_bytes() + hdr.to_bytes() + data
            + b"\0" * ((-len(data)) % 2880) + tail_hdr.to_bytes())
    p = tmp_path / "heap.fits"
    p.write_bytes(blob)
    hdus = pf.read_fits(str(p))
    assert [h.name for h in hdus][-1] == "TAIL"
    np.testing.assert_array_equal(hdus[1].data["VARR"], desc.astype("i4"))


def test_write_drops_stale_scaling_keywords(tmp_path):
    """Read-modify-write of scaled data must not re-emit BSCALE/BZERO (the
    written data is physical; a reader would double-apply them)."""
    import numpy as np
    from photometry_tpu.io import fits as pf
    hdr = pf.Header()
    hdr.set("SIMPLE", True)
    hdr.set("BITPIX", 16)
    hdr.set("NAXIS", 2)
    hdr.set("NAXIS1", 2)
    hdr.set("NAXIS2", 2)
    hdr.set("BSCALE", 2.0)
    hdr.set("BZERO", 100.0)
    raw = np.array([[1, 2], [3, 4]], ">i2")
    p = tmp_path / "s.fits"
    p.write_bytes(hdr.to_bytes() + raw.tobytes()
                  + b"\0" * ((-raw.nbytes) % 2880))
    hdus = pf.read_fits(str(p))
    np.testing.assert_array_equal(hdus[0].data, [[102, 104], [106, 108]])
    p2 = str(tmp_path / "rt.fits")
    pf.write_fits(p2, hdus)
    back = pf.read_fits(p2)[0]
    assert back.header.get("BSCALE") is None
    assert back.header.get("BZERO") is None
    np.testing.assert_array_equal(back.data, [[102, 104], [106, 108]])
