"""Tests of core.pixelflags (counterpart of reference tests/test_pixel_flags.py)."""

import numpy as np

from photometry_tpu.core.pixelflags import (manual_exclude_mask,
                                            shenanigans_residual)


def _hdr(**kw):
    base = {"TSTART": 1400.0, "TSTOP": 1400.02, "CAMERA": 3, "CCD": 2}
    base.update(kw)
    return base


def test_manual_exclude_mars():
    """Mars floods output channel D of S1 camera 1 CCD 4 at FFIINDEX<=4724
    (reference pixel_flags.py:14-38, test_pixel_flags.py:17-35)."""
    data = np.ones((2048, 2048), np.float32)
    mask = manual_exclude_mask(data, _hdr(CAMERA=1, CCD=4, FFIINDEX=4724))
    assert mask.dtype == bool and mask.shape == data.shape
    assert np.all(mask[:, 1536:])
    assert not np.any(mask[:, :1536])
    # one cadence later: clear
    mask2 = manual_exclude_mask(data, _hdr(CAMERA=1, CCD=4, FFIINDEX=4725))
    assert not mask2.any()


def test_manual_exclude_earthshine():
    """S1 camera 1 Earth-shine window flags the whole image
    (pixel_flags.py:40-49)."""
    data = np.ones((64, 64), np.float32)
    mask = manual_exclude_mask(data, _hdr(CAMERA=1, CCD=2, FFIINDEX=11360))
    assert mask.all()
    by_time = manual_exclude_mask(
        data, _hdr(CAMERA=1, CCD=3, TSTART=1464.1, TSTOP=1464.12))
    assert by_time.all()
    outside = manual_exclude_mask(data, _hdr(CAMERA=1, CCD=2, FFIINDEX=20000))
    assert not outside.any()


def test_manual_exclude_zero_image():
    """An all-zero image is fully excluded (pixel_flags.py:51-56)."""
    data = np.zeros((32, 32), np.float32)
    assert manual_exclude_mask(data, _hdr()).all()
    assert not manual_exclude_mask(np.ones((32, 32), np.float32), _hdr()).any()
    # non-TESS images skip all curated rules:
    assert not manual_exclude_mask(data, _hdr(), is_tess=False).any()


def test_shenanigans_residual_detects_blob():
    """The median-filtered residual vs the sum image lights up a transient
    blob (pixel_flags.py:61-79; prepare thresholds at 40 e-/s)."""
    rng = np.random.default_rng(0)
    base = rng.normal(100, 2, (64, 64)).astype(np.float32)
    sumimage = base.copy()
    img = base.copy()
    # EXTENDED glow (bigger than the 15x15 filter) — star-sized residuals
    # are deliberately erased by the median:
    img[16:40, 16:40] += 500.0
    img[50, 50] += 500.0                # single hot pixel: filtered away
    res = np.asarray(shenanigans_residual(img, sumimage=sumimage))
    assert res.shape == img.shape
    assert np.nanmax(res[24:32, 24:32]) > 40.0
    assert abs(res[50, 50]) < 40.0
    assert np.nanmax(np.abs(res[:8, :8])) < 40.0
