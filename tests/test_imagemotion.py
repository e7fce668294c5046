"""Tests of ECC registration and the motion model.

Counterpart of reference tests/test_imagemotion.py:23-114 — all warp modes
plus the WCS mode — using synthetic star fields with known shifts.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from photometry_tpu.ops.registration import ecc_align, prepare_flux, N_PARAMS
from photometry_tpu.core.motion import MotionModel


def _starfield(H=64, W=64, shift=(0.0, 0.0), theta=0.0, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.full((H, W), 100.0)
    pos = rng.uniform(8, H - 8, (12, 2))
    c, s = np.cos(theta), np.sin(theta)
    cy, cx = H / 2, W / 2
    for r0, c0 in pos:
        # standard rotation by +theta in (x, y) about the centre, plus shift:
        x0, y0 = c0 - cx, r0 - cy
        cc = cx + x0 * c - y0 * s + shift[0]
        rr = cy + x0 * s + y0 * c + shift[1]
        img += 5000 * np.exp(-0.5 * ((yy - rr) ** 2 + (xx - cc) ** 2) / 1.5 ** 2)
    return img.astype(np.float32)


def test_ecc_translation():
    # Truth tolerance 0.02 px: both this solver and cv2.findTransformECC
    # share a ~0.015 px truth bias on undersampled (sigma 1.5 px) fields —
    # inherent to the log+Scharr+bilinear ECC formulation, not solver error
    # (see tools/validate_ecc.py; the cross-validation bound below is the
    # sub-0.01 px criterion of SURVEY hard-part #4).
    ref = _starfield()
    for dx, dy in [(0.8, -0.5), (1.6, 2.2), (-2.0, 0.3)]:
        img = _starfield(shift=(dx, dy))
        p, cc = ecc_align(prepare_flux(ref), prepare_flux(img), mode="translation")
        p = np.asarray(p)
        assert p[0] == pytest.approx(dx, abs=0.02)
        assert p[1] == pytest.approx(dy, abs=0.02)
        assert float(cc) > 0.8


def _load_validate_ecc():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "validate_ecc.py")
    spec = importlib.util.spec_from_file_location("validate_ecc", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ecc_matches_opencv():
    """Cross-validation against cv2.findTransformECC (the reference's
    registration backend, image_motion.py:236) on the same preprocessed
    inputs: sub-0.01 px agreement where the ECC objective identifies a
    unique optimum, objective parity where noise flattens it."""
    pytest.importorskip("cv2")
    ve = _load_validate_ecc()
    rows = ve.run_corpus(verbose=False)
    noiseless = [r for r in rows if r["noise"] == 0]
    noisy = [r for r in rows if r["noise"] > 0]
    # Noiseless: every warp-matrix entry within 0.01 of OpenCV's, all modes.
    assert max(r["max_delta"] for r in noiseless) < 0.01, noiseless
    # Noisy, 2-3 param models: translations still within 0.01 px.
    lowdim = [r for r in noisy if r["mode"] in ("translation", "euclidian")]
    assert max(r["delta_translation"] for r in lowdim) < 0.01, lowdim
    # Noisy affine (6 params on 64^2 fields): the objective is flat at the
    # optimum — require objective parity with cv2 (|d rho| < 1e-4) and
    # translations within 0.05 px.
    aff = [r for r in noisy if r["mode"] == "affine"]
    assert max(abs(r["obj_delta"]) for r in aff) < 1e-4, aff
    assert max(r["delta_translation"] for r in aff) < 0.05, aff


def test_ecc_euclidian():
    ref = _starfield()
    img = _starfield(shift=(1.0, -0.7), theta=0.01)
    p, cc = ecc_align(prepare_flux(ref), prepare_flux(img), mode="euclidian")
    p = np.asarray(p)
    assert p[2] == pytest.approx(0.01, abs=0.003)
    assert float(cc) > 0.7


def test_ecc_affine():
    ref = _starfield()
    img = _starfield(shift=(0.5, 0.9))
    p, cc = ecc_align(prepare_flux(ref), prepare_flux(img), mode="affine")
    p = np.asarray(p).reshape(2, 3)
    # Affine matrix close to identity + translation:
    np.testing.assert_allclose(p[:, :2], np.eye(2), atol=0.02)
    assert p[0, 2] == pytest.approx(0.5, abs=0.1)
    assert p[1, 2] == pytest.approx(0.9, abs=0.1)


def test_motion_model_series_interpolation():
    mm = MotionModel(warpmode="translation")
    times = np.array([0.0, 1.0, 2.0])
    kernels = np.array([[0.0, 0.0], [1.0, 2.0], [2.0, 4.0]])
    mm.load_series(times, kernels)
    out = mm.jitter_batch(np.array([0.5, 1.5, 5.0]), np.array([10.0]), np.array([20.0]))
    assert out.shape == (3, 1, 2)
    np.testing.assert_allclose(out[0, 0], [0.5, 1.0], atol=1e-6)
    np.testing.assert_allclose(out[1, 0], [1.5, 3.0], atol=1e-6)
    # clamped extrapolation:
    np.testing.assert_allclose(out[2, 0], [2.0, 4.0], atol=1e-6)
    # single-star compat API:
    j = mm.jitter(np.array([0.5]), 10.0, 20.0)
    np.testing.assert_allclose(j[0], [0.5, 1.0], atol=1e-6)


def test_motion_model_euclidian_apply():
    mm = MotionModel(warpmode="euclidian")
    times = np.array([0.0, 1.0])
    th = 0.001
    kernels = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, th]])
    mm.load_series(times, kernels)
    out = mm.jitter_batch(np.array([1.0]), np.array([100.0]), np.array([0.0]))
    # Rotation by theta about origin: point (100, 0) moves ~(0, 100*theta):
    assert out[0, 0, 0] == pytest.approx(100 * (np.cos(th) - 1), abs=1e-4)
    assert out[0, 0, 1] == pytest.approx(100 * np.sin(th), abs=1e-4)


def test_motion_model_wcs_mode():
    from photometry_tpu.io.wcs import TanWCS
    scale = 21.0 / 3600
    cd = scale * np.eye(2)
    w_ref = TanWCS(crpix=np.array([32.0, 32.0]), crval=np.array([100.0, -40.0]), cd=cd)
    # Frame WCS shifted by +0.5 px in x (CRPIX moves -0.5):
    w1 = TanWCS(crpix=np.array([31.5, 32.0]), crval=np.array([100.0, -40.0]), cd=cd)
    mm = MotionModel(warpmode="wcs", wcs_ref=w_ref)
    mm.load_series(np.array([0.0, 1.0]),
                   [w_ref.to_header().to_bytes().decode("ascii"),
                    w1.to_header().to_bytes().decode("ascii")])
    out = mm.jitter_batch(np.array([0.0, 1.0, 0.5]), np.array([20.0]), np.array([20.0]))
    np.testing.assert_allclose(out[0, 0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1, 0], [-0.5, 0.0], atol=1e-3)
    np.testing.assert_allclose(out[2, 0], [-0.25, 0.0], atol=1e-3)
    # Empty WCS strings are dropped:
    mm2 = MotionModel(warpmode="wcs", wcs_ref=w_ref)
    mm2.load_series(np.array([0.0, 0.5, 1.0]),
                    [w_ref.to_header().to_bytes().decode("ascii"), "",
                     w1.to_header().to_bytes().decode("ascii")])
    assert len(mm2.series_times) == 2


def test_motion_model_invalid():
    with pytest.raises(ValueError):
        MotionModel(warpmode="bogus")
    mm = MotionModel(warpmode="translation")
    with pytest.raises(ValueError):
        mm.load_series(np.array([0.0, 1.0]), np.zeros((2, 3)))  # wrong n_params
    with pytest.raises(ValueError):
        mm.jitter_batch(np.array([0.0]), [1.0], [1.0])  # no series loaded
    mm2 = MotionModel(warpmode="unchanged")
    out = mm2.jitter_batch(np.array([0.0, 1.0]), [1.0, 2.0], [3.0, 4.0])
    assert out.shape == (2, 2, 2)
    assert np.all(out == 0)
