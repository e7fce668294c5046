"""Tests of the multi-chip sharded programs on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from photometry_tpu.parallel.mesh import make_mesh, cube_sharding
from photometry_tpu.parallel.sharded import (sharded_time_smooth,
                                             sharded_sumimage,
                                             sharded_extract_flux,
                                             prepare_step, extraction_step)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_time=4, n_targets=2)


def test_mesh_shapes(mesh):
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"time": 4, "targets": 2}
    with pytest.raises(ValueError):
        make_mesh(n_time=3, n_targets=2, devices=jax.devices()[:8])


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


def test_sharded_extract_matches_dense(mesh):
    rng = np.random.default_rng(2)
    T, H, W = 8, 64, 64
    N, h, w = 4, 9, 9
    imgs = rng.normal(100, 5, (T, H, W)).astype(np.float32)
    r0s = rng.integers(0, H - h, N).astype(np.int32)
    c0s = rng.integers(0, W - w, N).astype(np.int32)
    masks = rng.uniform(size=(N, h, w)) < 0.4
    with mesh:
        flux = np.asarray(sharded_extract_flux(
            jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(r0s),
            jnp.asarray(c0s), mesh, h, w))
    want = np.stack([
        np.nansum(np.where(masks[i][None], imgs[:, r0s[i]:r0s[i] + h,
                                                c0s[i]:c0s[i] + w], np.nan), axis=(1, 2))
        for i in range(N)])
    np.testing.assert_allclose(flux, want, rtol=1e-5)


def test_full_steps_run(mesh):
    rng = np.random.default_rng(3)
    T, H, W = 8, 64, 64
    imgs = jnp.asarray(rng.normal(100, 2, (T, H, W)).astype(np.float32))
    quality = jnp.zeros(T, jnp.int32)
    with mesh:
        sub, bkg, s = prepare_step(imgs, quality, mesh, tile=16)
        flux, metrics = extraction_step(
            sub, s, jnp.asarray(rng.uniform(size=(4, 9, 9)) < 0.5),
            jnp.asarray(rng.integers(0, H - 9, 4), jnp.int32),
            jnp.asarray(rng.integers(0, W - 9, 4), jnp.int32),
            jnp.linspace(1325.0, 1326.0, T), quality, mesh, 9, 9)
        jax.block_until_ready(flux)
    assert np.asarray(flux).shape == (4, T)
    assert np.all(np.isfinite(np.asarray(bkg)))
