"""Tests of the tools/ Pallas DMA extraction demo (interpret mode on CPU)."""

import importlib.util
import os

import numpy as np
import pytest
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location(
    "pallas_extract_demo",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "pallas_extract_demo.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
pallas_extract_flux = _mod.pallas_extract_flux
pallas_available = _mod.pallas_available


@pytest.mark.skipif(not pallas_available(), reason="pallas unavailable")
def test_pallas_extract_matches_reference():
    rng = np.random.default_rng(0)
    T, H, W = 16, 256, 256
    N, h, w = 5, 8, 8
    images = rng.normal(100, 5, (T, H, W)).astype(np.float32)
    images[2, 10, 10] = np.nan
    r0s = rng.integers(0, H - h, N).astype(np.int32)
    c0s = rng.integers(0, W - w, N).astype(np.int32)
    r0s[0], c0s[0] = 8, 8  # cover the NaN pixel in target 0
    masks = rng.uniform(size=(N, h, w)) < 0.4
    masks[0, 2, 2] = True

    got = np.asarray(pallas_extract_flux(images, masks, r0s, c0s, h, w,
                                         interpret=True))
    # reference numpy:
    want = np.empty((N, T))
    for i in range(N):
        st = images[:, r0s[i]:r0s[i] + h, c0s[i]:c0s[i] + w]
        vals = np.where(masks[i][None], st, np.nan)
        want[i] = np.nansum(vals, axis=(1, 2))
        empty = np.all(~np.isfinite(vals), axis=(1, 2))
        want[i, empty] = np.nan
    np.testing.assert_allclose(got, want, rtol=1e-5)
