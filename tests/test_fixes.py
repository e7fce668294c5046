"""Tests of the time-offset fix (counterpart of reference tests/test_fixes.py)."""

import numpy as np
import pytest

from photometry_tpu.fixes import time_offset, time_offset_seconds


def _hdr(**kw):
    h = {"DATA_REL": 26, "CAMERA": 1, "CCD": 1}
    h.update(kw)
    return h


def test_applies_to_early_releases():
    t = np.array([1000.0, 1000.5])
    out, flag = time_offset(t, _hdr(DATA_REL=20), datatype="ffi", return_flag=True)
    assert flag
    np.testing.assert_allclose(out - t, (-2.0 + 0.021) / 86400)


def test_not_applied_to_late_releases():
    t = np.array([1000.0])
    out, flag = time_offset(t, _hdr(DATA_REL=30), return_flag=True)
    assert not flag
    np.testing.assert_array_equal(out, t)


def test_already_corrected():
    out, flag = time_offset(np.array([1.0]), _hdr(TIME_OFFSET_CORRECTED=True), return_flag=True)
    assert not flag


def test_staggered_readout_by_camera_ccd():
    base = time_offset_seconds(_hdr(CAMERA=1, CCD=1))
    assert time_offset_seconds(_hdr(CAMERA=2, CCD=1)) - base == pytest.approx(1.5)
    assert time_offset_seconds(_hdr(CAMERA=3, CCD=3)) - base == pytest.approx(0.5 + 0.040)
    # TPFs do not get the staggered readout:
    assert time_offset_seconds(_hdr(CAMERA=2, CCD=1), datatype="tpf") == pytest.approx(-2.0 + 0.021)


def test_timepos_variants():
    assert time_offset_seconds(_hdr(), timepos="start") == pytest.approx(-2.0 + 0.031)
    assert time_offset_seconds(_hdr(), timepos="end") == pytest.approx(-2.0 + 0.011)
    with pytest.raises(ValueError):
        time_offset_seconds(_hdr(), timepos="bogus")


def test_dr27_requires_procver():
    with pytest.raises(ValueError):
        time_offset_seconds(_hdr(DATA_REL=27))
    # First-release PROCVER -> corrected, with stagger:
    s = time_offset_seconds(_hdr(DATA_REL=27, CAMERA=2, PROCVER="spoc-4.0.15-20200114"))
    assert s == pytest.approx(1.5 - 2.0 + 0.021)
    # Later PROCVER -> not corrected:
    assert time_offset_seconds(_hdr(DATA_REL=27, PROCVER="spoc-4.1.0")) == 0.0


def test_dr29_procver_whitelist():
    assert time_offset_seconds(_hdr(DATA_REL=29, PROCVER="spoc-4.0.20-20200220")) != 0.0
    assert time_offset_seconds(_hdr(DATA_REL=29, PROCVER="spoc-9.9.9")) == 0.0


def test_sector_info():
    from photometry_tpu.io.settings import sector_info
    s1 = sector_info(1)
    assert s1.ffi_cadence == 1800
    assert s1.reference_time == pytest.approx(2458351.5)
    s27 = sector_info(27)
    assert s27.ffi_cadence == 600
    table = sector_info()
    assert len(table) > 50
