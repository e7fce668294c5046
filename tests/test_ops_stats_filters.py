"""Tests of the statistics and filtering kernels against scipy/numpy truths."""

import numpy as np
import pytest
import jax.numpy as jnp

from photometry_tpu.ops import stats as st
from photometry_tpu.ops import filters as ft
from photometry_tpu.ops.spline import (make_natural_spline, eval_natural_spline,
                                       bicubic_eval)


def test_sigma_clip_mask():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(500)
    x[10] = 50.0
    x[20] = -40.0
    keep = np.asarray(st.sigma_clip_mask(x, sigma=3.0))
    assert not keep[10] and not keep[20]
    assert keep.sum() > 480
    # NaNs never survive:
    x[5] = np.nan
    keep = np.asarray(st.sigma_clip_mask(x))
    assert not keep[5]


def test_sextractor_mode_gaussian():
    rng = np.random.default_rng(1)
    x = rng.normal(100.0, 5.0, 4000)
    mode = float(np.asarray(st.sextractor_mode(x)))
    assert mode == pytest.approx(100.0, abs=0.7)
    # Skewed data (outlier cloud) -> still near the bulk:
    x2 = np.concatenate([x, rng.normal(200, 1.0, 300)])
    keep_mode = float(np.asarray(st.sextractor_mode(x2)))
    assert keep_mode == pytest.approx(100.0, abs=1.5)


def test_sextractor_mode_min_fraction():
    x = np.full((2, 100), 10.0)
    mask = np.zeros((2, 100), bool)
    mask[1, :80] = True  # only 20% valid
    out = np.asarray(st.sextractor_mode(x, mask=mask, min_fraction=0.5))
    assert out[0] == pytest.approx(10.0)
    assert np.isnan(out[1])


def test_kde_mode_matches_density_peak():
    rng = np.random.default_rng(2)
    # Asymmetric distribution: mode != mean != median
    x = np.concatenate([rng.normal(10.0, 0.5, 20000), rng.normal(13.0, 2.0, 8000)])
    mode = float(np.asarray(st.kde_mode(x)))
    assert mode == pytest.approx(10.0, abs=0.15)


def test_segment_kde_mode():
    rng = np.random.default_rng(3)
    n_seg = 10
    centers = np.linspace(50, 80, n_seg)
    values, segs = [], []
    for i, c in enumerate(centers):
        values.append(rng.normal(c, 1.0, 3000))
        segs.append(np.full(3000, i))
    values = np.concatenate(values)
    segs = np.concatenate(segs).astype(np.int32)
    modes = np.asarray(st.segment_kde_mode(values, segs, n_seg))
    np.testing.assert_allclose(modes, centers, atol=0.4)
    # Empty segment -> NaN:
    segs2 = np.where(segs == 4, 5, segs)
    modes = np.asarray(st.segment_kde_mode(values, segs2, n_seg))
    assert np.isnan(modes[4])


def test_segment_histogram_matmul_equals_scatter():
    """The MXU one-hot histogram (TPU fast path) builds the identical
    integer-count table as the segment-sum scatter, including masked
    samples, out-of-range segments and NaNs."""
    rng = np.random.default_rng(9)
    n = 70000  # not a multiple of the chunk size -> exercises padding
    values = rng.normal(60.0, 5.0, n).astype(np.float32)
    values[::97] = np.nan
    segs = rng.integers(-1, 13, n).astype(np.int32)  # incl. invalid -1 / 12
    mask = rng.uniform(size=n) < 0.1
    a = np.asarray(st.segment_kde_mode(values, segs, 12, mask=mask,
                                       method="matmul"))
    b = np.asarray(st.segment_kde_mode(values, segs, 12, mask=mask,
                                       method="scatter"))
    np.testing.assert_allclose(a, b, rtol=0, atol=0, equal_nan=True)


def test_median_filter_matches_scipy():
    from scipy.ndimage import median_filter
    rng = np.random.default_rng(4)
    img = rng.standard_normal((40, 37)).astype(np.float32)
    for size in (3, 5):
        got = np.asarray(ft.median_filter2d(img, size=size))
        want = median_filter(img, size=size, mode="reflect")
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_median_filter_chunked_matches():
    rng = np.random.default_rng(5)
    img = rng.standard_normal((100, 64)).astype(np.float32)
    got = np.asarray(ft.median_filter2d_chunked(img, size=5, chunk_rows=32))
    want = np.asarray(ft.median_filter2d(img, size=5))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gaussian_blur_preserves_flux():
    img = np.zeros((41, 41), np.float32)
    img[20, 20] = 100.0
    out = np.asarray(ft.gaussian_blur2d(img, sigma=2.0))
    assert out.sum() == pytest.approx(100.0, rel=1e-4)
    assert out[20, 20] == pytest.approx(100.0 / (2 * np.pi * 4), rel=0.02)


def test_scharr_detects_edges():
    img = np.zeros((20, 20), np.float32)
    img[:, 10:] = 1.0
    g = np.asarray(ft.scharr(img))
    assert g[10, 9] > 0.4 and g[10, 10] > 0.4
    assert g[10, 3] == pytest.approx(0.0, abs=1e-6)


def test_binary_morphology_and_fill():
    m = np.zeros((15, 15), bool)
    m[5:10, 5:10] = True
    m[7, 7] = False  # hole
    dil = np.asarray(ft.binary_dilation(m))
    assert dil.sum() > m.sum()
    ero = np.asarray(ft.binary_erosion(np.asarray(ft.binary_dilation(m))))
    filled = np.asarray(ft.fill_holes(m))
    assert filled[7, 7]
    assert filled.sum() == 25
    # A bay open to the border must NOT be filled:
    m2 = np.zeros((15, 15), bool)
    m2[0:5, 4] = True
    m2[0:5, 8] = True
    m2[5, 4:9] = True
    filled2 = np.asarray(ft.fill_holes(m2))
    assert not filled2[2, 6]


def test_natural_spline_matches_scipy():
    from scipy.interpolate import CubicSpline
    x = np.linspace(0, 10, 15).astype(np.float32)
    y = np.sin(x).astype(np.float32)
    sp = make_natural_spline(x, y)
    xq = np.linspace(0, 10, 200).astype(np.float32)
    got = np.asarray(eval_natural_spline(sp, xq))
    want = CubicSpline(x, y, bc_type="natural")(xq)
    np.testing.assert_allclose(got, want, atol=2e-5)
    # Clamped extrapolation:
    got_out = np.asarray(eval_natural_spline(sp, np.array([-5.0, 15.0])))
    np.testing.assert_allclose(got_out, [y[0], y[-1]], atol=2e-5)


def test_bicubic_eval_accuracy():
    # Smooth function sampled on a grid; Catmull-Rom should be ~O(h^3):
    yy, xx = np.mgrid[0:30, 0:30].astype(np.float32)
    grid = np.sin(xx / 5.0) * np.cos(yy / 7.0)
    yq = np.linspace(2, 27, 50).astype(np.float32)
    xq = np.linspace(2, 27, 50).astype(np.float32)
    got = np.asarray(bicubic_eval(grid, yq, xq))
    want = np.sin(xq / 5.0) * np.cos(yq / 7.0)
    np.testing.assert_allclose(got, want, atol=2e-3)
    # Exact at grid points:
    got = np.asarray(bicubic_eval(grid, np.array([3.0]), np.array([4.0])))
    assert got[0] == pytest.approx(grid[3, 4], abs=1e-6)


def test_time_moving_nanmean_matches_host_loop():
    """Device moving nanmean == the reference's per-frame host loop
    (prepare.py:309-338 semantics: centred window, shrinking edges, NaNs
    excluded)."""
    from photometry_tpu.ops.filters import (time_moving_nanmean,
                                            time_moving_nanmean_blocked)
    rng = np.random.default_rng(0)
    for T, window in [(10, 3), (25, 9), (40, 27)]:
        x = rng.normal(500, 20, (T, 6, 7)).astype(np.float32)
        x[2, 1, 1] = np.nan
        x[T // 2] = np.nan
        half = window // 2
        want = np.empty_like(x)
        for k in range(T):
            lo, hi = max(0, k - half), min(T, k + half + 1)
            with np.errstate(invalid="ignore"):
                want[k] = np.nanmean(x[lo:hi], axis=0)
        got = np.asarray(time_moving_nanmean(jnp.asarray(x), window))
        np.testing.assert_allclose(got, want, rtol=2e-5, equal_nan=True)
        # blocked form (halo'd chunks) agrees, incl. when blocks are small:
        got_b = time_moving_nanmean_blocked(x, window, block=7)
        np.testing.assert_allclose(got_b, want, rtol=2e-5, equal_nan=True)


def test_masked_median_bisect_exact_vs_numpy():
    """masked_median (value-bisection selection) is EXACTLY np.nanmedian of
    the selected entries — both order statistics for even counts, NaN for
    empty selections, duplicates, and the short-axis sort fallback."""
    rng = np.random.default_rng(3)
    for L in (300, 1024, 4097):
        x = rng.normal(50.0, 2000.0, (5, L)).astype(np.float32)
        x[rng.random((5, L)) < 0.1] = np.nan
        good = np.isfinite(x) & (rng.random((5, L)) < 0.8)
        good[0] = False                      # empty selection -> NaN
        x[1] = 7.5                           # all-duplicate row
        good[1] = True
        with np.errstate(invalid="ignore"):
            want = np.nanmedian(np.where(good, x, np.nan), axis=-1)
        got = np.asarray(st.masked_median(jnp.asarray(x), jnp.asarray(good),
                                          min_bisect=0))
        np.testing.assert_array_equal(got, want)
    # short-axis fallback path (sort) agrees too:
    x = rng.normal(0, 1, (4, 9)).astype(np.float32)
    good = rng.random((4, 9)) < 0.7
    with np.errstate(invalid="ignore"):
        want = np.nanmedian(np.where(good, x, np.nan), axis=-1)
    got = np.asarray(st.masked_median(jnp.asarray(x), jnp.asarray(good)))
    np.testing.assert_array_equal(got, want)


def test_masked_median_extreme_range_exact():
    """Bit-pattern bisection stays exact under extreme dynamic range: a 1e20
    (or ±inf, or denormal) outlier must not stall the bounds the way value
    bisection did (measured 80.8 vs true 99.8 pre-fix)."""
    rng = np.random.default_rng(7)
    base = rng.normal(100.0, 1.0, 501).astype(np.float32)
    for outlier in (1e20, -1e20, np.inf, -np.inf, 1e-38, 1e38):
        x = base.copy()
        x[0] = outlier
        good = np.ones_like(x, bool)
        want = np.median(x.astype(np.float64)).astype(np.float32)
        got = np.asarray(st.masked_median(jnp.asarray(x), jnp.asarray(good),
                                          min_bisect=0))
        np.testing.assert_array_equal(got, np.float32(want))
    # mixed huge spread, even count (both middles straddle the range):
    x = np.array([-1e30, -5.0, -4.0, 3.0, 7.0, 1e25] * 100, np.float32)
    good = np.ones_like(x, bool)
    got = np.asarray(st.masked_median(jnp.asarray(x), jnp.asarray(good),
                                      min_bisect=0))
    want = np.float32(np.median(x.astype(np.float64)))
    np.testing.assert_array_equal(got, want)


def test_median_filter_survives_huge_outlier():
    """A 3.4e38 pixel (nan_to_num of +inf) must not collapse neighbouring
    window medians to the window minimum — the old fixed-range value
    bisection stalled after 40 halvings from vmax~3.4e38 (round-3 review
    find); the bit-pattern bisection is range-independent."""
    from photometry_tpu.ops.filters import median_filter2d_chunked
    rng = np.random.default_rng(3)
    img = rng.normal(100.0, 1.0, (40, 40)).astype(np.float32)
    img[20, 20] = np.inf        # nan_to_num -> 3.4e38 inside the filter
    got = median_filter2d_chunked(img, size=15)
    import scipy.ndimage as ndi
    want = ndi.median_filter(np.nan_to_num(img), size=15, mode="reflect")
    # everywhere except windows containing the outlier pixel itself the
    # median is outlier-free; require exact agreement with scipy:
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_motion_load_series_all_invalid_raises():
    from photometry_tpu.core.motion import MotionModel
    m = MotionModel(warpmode="translation")
    with pytest.raises(ValueError, match="No valid"):
        m.load_series(np.array([0.0, 1.0]),
                      np.array([[np.nan, 1.0], [2.0, np.inf]]))
