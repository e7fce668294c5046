"""Tests of the multi-chip sharded programs on the 8-device CPU mesh.

The key assertion (VERDICT r1 item 2): the sharded extraction is the
*production* program — it must reproduce the single-device
core.engine._extract_flux_batch outputs exactly on the same inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from photometry_tpu.parallel.mesh import make_mesh, cube_sharding
from photometry_tpu.parallel.sharded import (sharded_time_smooth,
                                             sharded_sumimage,
                                             sharded_extract_flux,
                                             prepare_step, extraction_step,
                                             pad_to_multiple)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_time=4, n_targets=2)


def _extraction_inputs(T=8, H=64, W=64, N=4, h=9, w=9, seed=2):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(100, 5, (T, H, W)).astype(np.float32)
    imgs[1, 10, 10] = np.nan
    errs = (np.sqrt(np.abs(imgs)) + 1.0).astype(np.float32)
    bkgs = rng.normal(20, 1, (T, H, W)).astype(np.float32)
    pflags = (rng.uniform(size=(T, H, W)) < 0.01).astype(np.uint8) * 4
    r0s = rng.integers(0, H - h, N).astype(np.int32)
    c0s = rng.integers(0, W - w, N).astype(np.int32)
    masks = rng.uniform(size=(N, h, w)) < 0.4
    masks[:, h // 2, w // 2] = True
    return imgs, errs, bkgs, pflags, masks, r0s, c0s


def test_mesh_shapes(mesh):
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"time": 4, "targets": 2}
    with pytest.raises(ValueError):
        make_mesh(n_time=3, n_targets=2, devices=jax.devices()[:8])


def test_pad_to_multiple():
    arr = np.arange(10, dtype=np.float32)
    padded, n = pad_to_multiple(arr, 0, 4)
    assert n == 10 and padded.shape == (12,) and np.isnan(padded[10:]).all()
    same, n2 = pad_to_multiple(arr, 0, 5)
    assert n2 == 10 and same.shape == (10,)


def test_sharded_time_smooth_matches_host(mesh):
    rng = np.random.default_rng(0)
    T, H, W = 16, 16, 16
    bkg = rng.normal(100, 3, (T, H, W)).astype(np.float32)
    with mesh:
        out = np.asarray(sharded_time_smooth(
            jax.device_put(jnp.asarray(bkg), cube_sharding(mesh)), mesh, window=3))
    # host reference: centred moving mean with shrinking edges:
    want = np.empty_like(bkg)
    for k in range(T):
        lo, hi = max(0, k - 1), min(T, k + 2)
        want[k] = bkg[lo:hi].mean(axis=0)
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_sharded_sumimage_matches_numpy(mesh):
    rng = np.random.default_rng(1)
    T, H, W = 16, 16, 16
    imgs = rng.normal(50, 2, (T, H, W)).astype(np.float32)
    imgs[3, 4, 5] = np.nan
    quality_good = np.ones(T, bool)
    quality_good[2] = False
    with mesh:
        out = np.asarray(sharded_sumimage(
            jax.device_put(jnp.asarray(imgs), cube_sharding(mesh)),
            jnp.asarray(quality_good), mesh))
    sel = imgs[quality_good]
    want = np.nanmean(sel, axis=0)
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_sharded_extract_matches_single_device_exactly(mesh):
    """8-device sharded extraction == single-device production program."""
    from photometry_tpu.core.engine import _extract_flux_batch
    imgs, errs, bkgs, pflags, masks, r0s, c0s = _extraction_inputs()
    h, w = masks.shape[1:]
    with mesh:
        out_sharded = sharded_extract_flux(
            imgs, errs, bkgs, pflags, masks, r0s, c0s, mesh, h, w)
        out_sharded = [np.asarray(o) for o in out_sharded]
    out_single = _extract_flux_batch(
        jnp.asarray(imgs), jnp.asarray(errs), jnp.asarray(bkgs),
        jnp.asarray(pflags), jnp.asarray(masks), jnp.asarray(r0s),
        jnp.asarray(c0s), h, w)
    names = ["flux", "flux_err", "flux_bkg", "centroid", "shenanigans"]
    for name, a, b in zip(names, out_sharded, out_single):
        # flux/err/bkg/shenanigans are bitwise equal; the centroid divide
        # can differ by float32 ulps from XLA fusion-order differences.
        rtol = 1e-6 if name == "centroid" else 0
        np.testing.assert_allclose(a, np.asarray(b), rtol=rtol, atol=0,
                                   err_msg=f"sharded {name} != single-device")


def test_sharded_extract_products_are_real(mesh):
    """flux_err/flux_bkg/centroids come from the err/bkg cubes, not proxies."""
    imgs, errs, bkgs, pflags, masks, r0s, c0s = _extraction_inputs(seed=5)
    h, w = masks.shape[1:]
    with mesh:
        flux, ferr, fbkg, cent, shen = [
            np.asarray(o) for o in sharded_extract_flux(
                imgs, errs, bkgs, pflags, masks, r0s, c0s, mesh, h, w)]
    i = 0
    m = masks[i]
    st_err = errs[:, r0s[i]:r0s[i] + h, c0s[i]:c0s[i] + w]
    want_err = np.sqrt(np.sum(np.where(m[None], st_err, 0.0) ** 2, axis=(1, 2)))
    np.testing.assert_allclose(ferr[i], want_err, rtol=1e-5)
    st_bkg = bkgs[:, r0s[i]:r0s[i] + h, c0s[i]:c0s[i] + w]
    want_bkg = np.sum(np.where(m[None], st_bkg, 0.0), axis=(1, 2))
    np.testing.assert_allclose(fbkg[i], want_bkg, rtol=1e-5)
    assert np.all(np.isfinite(cent[i]))
    # centroid lies inside the stamp (1-based CCD coordinates):
    assert np.all(cent[i, :, 0] >= c0s[i] + 1) and np.all(cent[i, :, 0] <= c0s[i] + w)
    assert np.all(cent[i, :, 1] >= r0s[i] + 1) and np.all(cent[i, :, 1] <= r0s[i] + h)
    assert shen.dtype == bool


def test_full_steps_run(mesh):
    rng = np.random.default_rng(3)
    T, H, W = 8, 64, 64
    imgs = rng.normal(100, 2, (T, H, W)).astype(np.float32)
    quality = np.zeros(T, np.int32)
    errs = np.sqrt(np.abs(imgs)) + 1.0
    pflags = np.zeros((T, H, W), np.uint8)
    masks = rng.uniform(size=(4, 9, 9)) < 0.5
    r0s = rng.integers(0, H - 9, 4).astype(np.int32)
    c0s = rng.integers(0, W - 9, 4).astype(np.int32)
    with mesh:
        sub, bkg, s = prepare_step(imgs, quality, mesh, tile=16)
        lc, metrics = extraction_step(
            sub, errs, bkg, pflags, masks, r0s, c0s,
            np.linspace(1325.0, 1326.0, T), quality, mesh, 9, 9)
        jax.block_until_ready(lc)
    flux = np.asarray(lc["flux"])
    assert flux.shape == (4, T)
    assert np.all(np.isfinite(np.asarray(bkg)))
    assert np.asarray(lc["flux_err"]).shape == (4, T)
    assert np.asarray(lc["pos_centroid"]).shape == (4, T, 2)
    assert np.asarray(metrics["rms_hour"]).shape == (4,)


def test_sharded_band_extract_matches_single(mesh):
    """Time-sharded banded (MXU) extraction == single-device band kernel,
    which itself == the gather production program (tests/test_bandext.py)."""
    from photometry_tpu.parallel.sharded import sharded_band_extract
    from photometry_tpu.ops.bandext import band_extract_flux_batch
    rng = np.random.default_rng(9)
    T, H, W = 16, 128, 256
    N, h, w = 10, 17, 17
    imgs = rng.normal(100, 5, (T, H, W)).astype(np.float32)
    imgs[1, 10, 10] = np.nan
    errs = (np.sqrt(np.abs(imgs)) + 1.0).astype(np.float32)
    bkgs = rng.normal(20, 1, (T, H, W)).astype(np.float32)
    pflags = (rng.uniform(size=(T, H, W)) < 0.01).astype(np.uint8) * 4
    r0s = rng.integers(0, H - h, N).astype(np.int32)
    c0s = rng.integers(0, W - w, N).astype(np.int32)
    masks = rng.uniform(size=(N, h, w)) < 0.4
    masks[:, h // 2, w // 2] = True
    with mesh:
        got = sharded_band_extract(imgs, errs, bkgs, pflags, masks, r0s, c0s,
                                   mesh, h, w, interpret=True)
        got = [np.asarray(o) for o in got]
    want = band_extract_flux_batch(imgs, errs, bkgs, pflags, masks, r0s, c0s,
                                   h, w, t_block=4, interpret=True)
    for name, a, b in zip(["flux", "ferr", "fbkg", "cent", "shen"], got, want):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4,
                                       equal_nan=True, err_msg=name)


def test_sharded_psf_fit_matches_single_device(mesh):
    """PSF fits shard over the flattened mesh with no collectives; results
    must equal the single-device batched fit exactly, incl. a non-divisible
    target count (padding dropped)."""
    from photometry_tpu.models.prf import PRF
    from photometry_tpu.models.psf_fit import fit_psf_timeseries_batch
    from photometry_tpu.parallel.sharded import sharded_psf_fit

    prf = PRF.gaussian(sigma=1.1)
    N, T, h, w, S = 11, 4, 13, 13, 2          # 11 % 8 != 0 on purpose
    rng = np.random.default_rng(3)
    rows = 6.0 + rng.uniform(-1.5, 1.5, (N, S)).astype(np.float32)
    cols = 6.0 + rng.uniform(-1.5, 1.5, (N, S)).astype(np.float32)
    fx = rng.uniform(3000, 9000, (N, S)).astype(np.float32)
    imgs = np.stack([np.asarray(prf.integrate_to_image(
        np.stack([rows[i], cols[i], fx[i]], 1), (h, w), 5.0)) for i in range(N)])
    imgs = np.repeat(imgs[:, None], T, axis=1)
    imgs += rng.normal(0, 0.5, imgs.shape).astype(np.float32)
    p0 = np.concatenate([rows + 0.2, cols - 0.1, fx * 0.8], 1).astype(np.float32)
    valid = np.ones((N, S), bool)
    bkgs = np.zeros((N, T, h, w), np.float32)
    mini = np.ones((N, h, w), bool)
    tidx = np.zeros(N, np.int32)

    single = fit_psf_timeseries_batch(jnp.asarray(imgs), jnp.asarray(bkgs),
                                      1.0, jnp.asarray(p0), jnp.asarray(valid),
                                      jnp.asarray(mini), jnp.asarray(tidx),
                                      prf, (h, w), S)
    sharded = sharded_psf_fit(imgs, bkgs, 1.0, p0, valid, mini, tidx,
                              prf, (h, w), S, mesh)
    for k in ("flux", "flux_err", "pos"):
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(single[k]), rtol=1e-5, atol=1e-4)
