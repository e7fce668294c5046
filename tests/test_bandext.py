"""Banded full-pass extraction == production gather extraction (interpret).

The banded Pallas kernel (ops.bandext) is the TPU fast path for dense target
fields; it must reproduce core.engine.extract_flux_core outputs including
the NaN / all-zero / all-bad semantics (BasePhotometry.py:1323-1414).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from photometry_tpu.ops.bandext import (band_extract_flux_batch,
                                        build_piece_patches, bands_supported,
                                        BH, TW)
from photometry_tpu.core.engine import _extract_flux_batch


def _inputs(T=16, H=128, W=256, N=14, h=17, w=17, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(100, 5, (T, H, W)).astype(np.float32)
    imgs[1, 10, 10] = np.nan
    imgs[3] = 0.0                      # exercises the all-zero branch
    errs = (np.sqrt(np.abs(imgs)) + 1.0).astype(np.float32)
    errs[2, 20, 20] = np.nan
    bkgs = rng.normal(20, 1, (T, H, W)).astype(np.float32)
    bkgs[4, 30, 30] = np.nan
    pflags = (rng.uniform(size=(T, H, W)) < 0.01).astype(np.uint8) * 4
    r0s = rng.integers(0, H - h, N).astype(np.int32)
    c0s = rng.integers(0, W - w, N).astype(np.int32)
    masks = rng.uniform(size=(N, h, w)) < 0.4
    masks[:, h // 2, w // 2] = True
    return imgs, errs, bkgs, pflags, masks, r0s, c0s


def _assert_parity(got, want):
    for name, a, b in zip(["flux", "ferr", "fbkg", "cent", "shen"], got, want):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3,
                                       equal_nan=True, err_msg=name)


def test_band_matches_gather_extraction():
    imgs, errs, bkgs, pflags, masks, r0s, c0s = _inputs()
    h, w = masks.shape[1:]
    got = band_extract_flux_batch(imgs, errs, bkgs, pflags, masks, r0s, c0s,
                                  h, w, t_block=8, interpret=True)
    want = _extract_flux_batch(
        jnp.asarray(imgs), jnp.asarray(errs), jnp.asarray(bkgs),
        jnp.asarray(pflags), jnp.asarray(masks), jnp.asarray(r0s),
        jnp.asarray(c0s), h, w)
    _assert_parity(got, want)


def test_band_cell_straddling_stamps():
    """Stamps placed exactly across cell boundaries split into pieces."""
    T, H, W, h, w = 8, 128, 256, 17, 17
    rng = np.random.default_rng(3)
    imgs = rng.normal(100, 5, (T, H, W)).astype(np.float32)
    errs = np.ones_like(imgs)
    bkgs = np.zeros_like(imgs)
    pflags = np.zeros((T, H, W), np.uint8)
    # corners straddling band boundary (row 64) and tile boundary (col 128):
    r0s = np.array([BH - 8, 10, BH - 1], np.int32)
    c0s = np.array([TW - 8, TW - 16, TW - 1], np.int32)
    masks = np.ones((3, h, w), bool)
    pieces = build_piece_patches(masks, r0s, c0s, (H, W))
    assert pieces["M"] >= 1
    got = band_extract_flux_batch(imgs, errs, bkgs, pflags, masks, r0s, c0s,
                                  h, w, t_block=8, interpret=True,
                                  pieces=pieces)
    want = _extract_flux_batch(
        jnp.asarray(imgs), jnp.asarray(errs), jnp.asarray(bkgs),
        jnp.asarray(pflags), jnp.asarray(masks), jnp.asarray(r0s),
        jnp.asarray(c0s), h, w)
    _assert_parity(got, want)


def test_band_remainder_time_blocks():
    """T not divisible by t_block runs a main + remainder launch."""
    imgs, errs, bkgs, pflags, masks, r0s, c0s = _inputs(T=12)
    h, w = masks.shape[1:]
    got = band_extract_flux_batch(imgs, errs, bkgs, pflags, masks, r0s, c0s,
                                  h, w, t_block=8, interpret=True)
    want = _extract_flux_batch(
        jnp.asarray(imgs), jnp.asarray(errs), jnp.asarray(bkgs),
        jnp.asarray(pflags), jnp.asarray(masks), jnp.asarray(r0s),
        jnp.asarray(c0s), h, w)
    _assert_parity(got, want)


def test_bands_supported():
    assert bands_supported((2048, 2048))
    assert not bands_supported((96, 96))
    with pytest.raises(ValueError):
        imgs = np.zeros((4, 96, 96), np.float32)
        band_extract_flux_batch(imgs, imgs, imgs,
                                np.zeros((4, 96, 96), np.uint8),
                                np.ones((1, 5, 5), bool),
                                np.array([0], np.int32),
                                np.array([0], np.int32), 5, 5, interpret=True)


def test_band_bf16_cubes():
    """bfloat16 cubes run through the band kernel (f32 accumulation) with
    preview-grade accuracy; supported for HBM-capacity reasons (measured on
    TPU: no speed gain — the kernel is MXU/VPU-bound, not bandwidth-bound)."""
    imgs, errs, bkgs, pflags, masks, r0s, c0s = _inputs()
    h, w = masks.shape[1:]
    i16 = jnp.asarray(imgs, jnp.bfloat16)
    e16 = jnp.asarray(errs, jnp.bfloat16)
    b16 = jnp.asarray(bkgs, jnp.bfloat16)
    got = band_extract_flux_batch(i16, e16, b16, pflags, masks, r0s, c0s,
                                  h, w, t_block=8, interpret=True)
    want = band_extract_flux_batch(imgs, errs, bkgs, pflags, masks, r0s, c0s,
                                   h, w, t_block=8, interpret=True)
    f16, f32 = np.asarray(got[0]), np.asarray(want[0])
    ok = np.isfinite(f32)
    assert np.nanmax(np.abs(f16[ok] / f32[ok] - 1)) < 5e-3


def test_shenanigans_limited_to_logical_window():
    """A BackgroundShenanigans pixel inside the shared padded bucket but
    OUTSIDE a target's logical stamp must not flag that target (round-3
    review: bucket-wide shen made quality flags depend on batch
    composition; reference checks 'somewhere in the final stamp')."""
    from photometry_tpu.core.engine import extract_flux_core
    from photometry_tpu.quality import PixelQualityFlags
    T, H, W = 3, 64, 128
    h = w = 24
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(100, 1, (T, H, W)).astype(np.float32))
    errs = jnp.ones((T, H, W), jnp.float32)
    bkgs = jnp.zeros((T, H, W), jnp.float32)
    pflags = np.zeros((T, H, W), np.uint8)
    # shen pixel at (20, 20): inside the bucket, outside target 0's window
    pflags[:, 20, 20] = PixelQualityFlags.BackgroundShenanigans
    pflags_j = jnp.asarray(pflags)

    masks = np.zeros((2, h, w), bool)
    masks[:, 4:8, 4:8] = True
    r0s = np.array([0, 30], np.int32)
    c0s = np.array([0, 60], np.int32)
    windows = np.zeros((2, h, w), bool)
    windows[0, :10, :10] = True      # target 0: small logical stamp
    windows[1] = True                # target 1: whole bucket

    # gather path:
    out = extract_flux_core(imgs, errs, bkgs, pflags_j,
                            jnp.asarray(masks), jnp.asarray(r0s),
                            jnp.asarray(c0s), h, w,
                            windows=jnp.asarray(windows))
    shen = np.asarray(out[4])
    assert not shen[0].any(), "shen leaked outside the logical window"
    # no window arg -> bucket-wide (legacy behavior):
    out2 = extract_flux_core(imgs, errs, bkgs, pflags_j,
                             jnp.asarray(masks), jnp.asarray(r0s),
                             jnp.asarray(c0s), h, w)
    assert np.asarray(out2[4])[0].all()

    # banded path agrees (interpret mode on CPU):
    if bands_supported((H, W)):
        got = band_extract_flux_batch(imgs, errs, bkgs, pflags_j, masks,
                                      r0s, c0s, h, w, interpret=True,
                                      windows=windows)
        np.testing.assert_array_equal(np.asarray(got[4]), shen)
