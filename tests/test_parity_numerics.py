"""Numerical parity of the TPU labeling/segmentation kernels against the
reference's algorithm libraries (scipy.ndimage, sklearn DBSCAN), and tight
photometric parity for isolated stars.

VERDICT r1 item 7: cross-validate label_components against scipy, the
DBSCAN rule against sklearn on a random corpus, watershed ridge placement
against analytic basins, and ±5% aperture flux for isolated stars.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from photometry_tpu.ops.labeling import (label_components, dbscan_labels,
                                         watershed_segment)


def _partition_equal(a, b):
    """Two label images describe the same partition (up to renaming)."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    if not np.array_equal(a > 0, b > 0):
        return False
    fg = a > 0
    pairs = set(zip(a[fg].tolist(), b[fg].tolist()))
    # bijective mapping <-> same number of distinct labels on each side:
    return (len(pairs) == len({p[0] for p in pairs})
            == len({p[1] for p in pairs}))


def test_label_components_vs_scipy_corpus():
    """8-connected components == scipy.ndimage.label on 60 random masks."""
    from scipy import ndimage
    rng = np.random.default_rng(0)
    structure = np.ones((3, 3))
    for trial in range(60):
        H = int(rng.integers(8, 40))
        W = int(rng.integers(8, 40))
        density = rng.uniform(0.05, 0.7)
        mask = rng.uniform(size=(H, W)) < density
        got = np.asarray(label_components(jnp.asarray(mask)))
        want, _ = ndimage.label(mask, structure=structure)
        assert _partition_equal(got, want), f"trial {trial}"
        assert got.max() == want.max()


def test_dbscan_vs_sklearn_corpus():
    """dbscan_labels == sklearn DBSCAN(eps=sqrt(2), min_samples=4) on a
    random corpus: identical core points, identical noise set, identical
    cluster partition of the cores; border pixels belong to a cluster that
    sklearn could also assign (adjacent core cluster)."""
    from sklearn.cluster import DBSCAN
    rng = np.random.default_rng(1)
    eps = np.sqrt(2) + 1e-9
    for trial in range(40):
        H = int(rng.integers(10, 32))
        W = int(rng.integers(10, 32))
        mask = rng.uniform(size=(H, W)) < rng.uniform(0.1, 0.6)
        got = np.asarray(dbscan_labels(jnp.asarray(mask), min_samples=4))
        ys, xs = np.nonzero(mask)
        if len(ys) == 0:
            assert got.max() == 0
            continue
        db = DBSCAN(eps=eps, min_samples=4).fit(np.stack([xs, ys], axis=1))
        ref = np.zeros((H, W), int)
        ref[ys, xs] = db.labels_ + 1          # 0 = noise
        core = np.zeros((H, W), bool)
        core[ys[db.core_sample_indices_], xs[db.core_sample_indices_]] = True

        # identical noise / cluster membership sets:
        np.testing.assert_array_equal(got > 0, ref > 0, err_msg=f"trial {trial}")
        # identical partition on core points:
        assert _partition_equal(np.where(core, got, 0),
                                np.where(core, ref, 0)), f"trial {trial}"
        # border points: our cluster must contain an adjacent core point:
        border = (got > 0) & ~core
        for y, x in zip(*np.nonzero(border)):
            nb = got[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2]
            nc = core[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2]
            assert got[y, x] in nb[nc], f"trial {trial} border ({y},{x})"


def test_dbscan_drops_line_structures():
    """A thin 1-px line has no core points -> all noise (the component-size
    cut of round 1 wrongly kept it; reference k2p2v2.py:63-86)."""
    mask = np.zeros((12, 12), bool)
    mask[6, 2:10] = True
    got = np.asarray(dbscan_labels(jnp.asarray(mask), min_samples=4))
    assert got.max() == 0
    # A 2x4 block: every pixel has >=5 neighbors + self -> one cluster:
    mask2 = np.zeros((12, 12), bool)
    mask2[4:6, 3:7] = True
    got2 = np.asarray(dbscan_labels(jnp.asarray(mask2), min_samples=4))
    assert got2[mask2].min() == got2[mask2].max() == 1


def test_watershed_ridge_analytic_two_gaussians():
    """Basin boundary between two Gaussians lands at the analytic valley
    (within one ridge pixel), for a range of amplitude ratios."""
    H, W = 31, 61
    yy, xx = np.mgrid[0:H, 0:W]
    y0 = H // 2
    for amp2, x1, x2, s in [(1.0, 18, 42, 3.0), (3.0, 18, 42, 3.0),
                            (10.0, 15, 45, 4.0)]:
        img = (np.exp(-0.5 * ((xx - x1) ** 2 + (yy - y0) ** 2) / s ** 2)
               + amp2 * np.exp(-0.5 * ((xx - x2) ** 2 + (yy - y0) ** 2) / s ** 2))
        # analytic valley along the connecting line:
        xs = np.linspace(x1, x2, 2001)
        prof = (np.exp(-0.5 * (xs - x1) ** 2 / s ** 2)
                + amp2 * np.exp(-0.5 * (xs - x2) ** 2 / s ** 2))
        x_valley = xs[np.argmin(prof)]
        markers = np.zeros((H, W), np.int32)
        markers[y0, x1] = 1
        markers[y0, x2] = 2
        mask = img > 1e-4
        labels = np.asarray(watershed_segment(jnp.asarray(img, jnp.float32),
                                              jnp.asarray(markers),
                                              jnp.asarray(mask)))
        row = labels[y0]
        cols1 = np.nonzero(row == 1)[0]
        cols2 = np.nonzero(row == 2)[0]
        assert len(cols1) and len(cols2)
        boundary = 0.5 * (cols1.max() + cols2.min())
        assert abs(boundary - x_valley) <= 1.5, \
            f"amp2={amp2}: boundary {boundary} vs valley {x_valley:.2f}"
        # no mislabeled pixels deep inside either basin:
        assert np.all(row[:int(x_valley) - 1][row[:int(x_valley) - 1] > 0] == 1)
        assert np.all(row[int(x_valley) + 2:][row[int(x_valley) + 2:] > 0] == 2)


def test_watershed_vs_components_on_separated_blobs():
    """Fully separated blobs: watershed == connected components."""
    from scipy import ndimage
    rng = np.random.default_rng(4)
    H = W = 48
    img = np.zeros((H, W), np.float32)
    centers = [(10, 10), (10, 36), (36, 12), (34, 38)]
    for k, (cy, cx) in enumerate(centers):
        yy, xx = np.mgrid[0:H, 0:W]
        img += (k + 1) * np.exp(-0.5 * ((xx - cx) ** 2 + (yy - cy) ** 2) / 2.0 ** 2)
    mask = img > 0.05
    markers = np.zeros((H, W), np.int32)
    for k, (cy, cx) in enumerate(centers):
        markers[cy, cx] = k + 1
    got = np.asarray(watershed_segment(jnp.asarray(img), jnp.asarray(markers),
                                       jnp.asarray(mask)))
    want, _ = ndimage.label(mask, structure=np.ones((3, 3)))
    assert _partition_equal(got, want)


def test_table_prf_vs_rectbivariatespline_integral(tmp_path):
    """Calibrated-table PRF machinery (.mat load -> pixel-integrated table ->
    Catmull-Rom evaluation) against the reference's exact method:
    RectBivariateSpline(...).integral over each pixel box (psf.py:119,137-147)
    on a NON-separable synthetic PRF."""
    from scipy.interpolate import RectBivariateSpline
    from photometry_tpu.models.prf import PRF

    oversample, radius = 9, 6.0
    n = int(radius * oversample)
    coords = np.arange(-n, n + 1) / oversample
    xx, yy = np.meshgrid(coords, coords)          # (row, col) grid
    # non-separable: rotated elongated Gaussian + offset secondary lobe
    th = np.deg2rad(30.0)
    u = np.cos(th) * xx + np.sin(th) * yy
    v = -np.sin(th) * xx + np.cos(th) * yy
    grid = (np.exp(-0.5 * (u ** 2 / 1.8 ** 2 + v ** 2 / 0.9 ** 2))
            + 0.15 * np.exp(-0.5 * (((xx - 1.2) ** 2 + (yy + 0.8) ** 2) / 0.8 ** 2)))

    path = str(tmp_path / "prf.mat")
    PRF.write_mat(path, [grid], [1024.0], [1024.0],
                  oversample=oversample, radius=radius)
    prf = PRF.from_mat(path, sector=1, camera=1, ccd=1, stamp=(0, 15, 0, 15))

    # Reference comparator: normalised spline + exact pixel-box integrals:
    dx = 1.0 / oversample
    norm = grid / (grid.sum() * dx * dx)
    spl = RectBivariateSpline(coords, coords, norm.T)  # (column, row) axes
    stars = np.array([[7.3, 6.8, 1000.0], [4.1, 9.6, 300.0]])
    want = np.zeros((15, 15))
    for i in range(15):
        for j in range(15):
            for row_s, col_s, f in stars:
                cc, rc = j - col_s, i - row_s
                want[i, j] += f * spl.integral(cc - 0.5, cc + 0.5,
                                               rc - 0.5, rc + 0.5)
    got = np.asarray(prf.integrate_to_image(stars, (15, 15),
                                            cutoff_radius=None))
    peak = want.max()
    np.testing.assert_allclose(got / peak, want / peak, atol=2e-3)
    # total flux conserved at the 1% level:
    assert abs(got.sum() - want.sum()) / want.sum() < 0.01


def test_separable_table_render_matches_gather_form(tmp_path):
    """The gather-free SVD-separable table render == the per-pixel
    Catmull-Rom evaluation (same interpolation applied to the truncated
    reconstruction), for renders and design matrices."""
    import jax.numpy as jnp2
    from photometry_tpu.models.prf import PRF

    oversample, radius = 9, 6.0
    n = int(radius * oversample)
    coords = np.arange(-n, n + 1) / oversample
    xx, yy = np.meshgrid(coords, coords)
    th = np.deg2rad(20.0)
    u = np.cos(th) * xx + np.sin(th) * yy
    v = -np.sin(th) * xx + np.cos(th) * yy
    grid = np.exp(-0.5 * (u ** 2 / 1.6 ** 2 + v ** 2 / 1.0 ** 2))
    path = str(tmp_path / "prf.mat")
    PRF.write_mat(path, [grid], [1024.0], [1024.0],
                  oversample=oversample, radius=radius)
    prf = PRF.from_mat(path, sector=5, camera=2, ccd=3, stamp=(0, 13, 0, 13))
    assert prf._grid_separable

    stars = np.array([[6.3, 5.8, 1000.0], [3.1, 8.6, 250.0]])
    got = np.asarray(prf._render_separable(stars, (13, 13), 5.0))
    # reference formulation: per-pixel bicubic evaluation of the table:
    rows = jnp2.arange(13, dtype=jnp2.float32)[:, None, None]
    cols = jnp2.arange(13, dtype=jnp2.float32)[None, :, None]
    drow = rows - stars[None, None, :, 0]
    dcol = cols - stars[None, None, :, 1]
    frac = prf.pixel_fraction(drow, dcol)
    frac = jnp2.where(drow ** 2 + dcol ** 2 < 25.0, frac, 0.0)
    want = np.asarray(jnp2.sum(frac * stars[None, None, :, 2], axis=-1))
    np.testing.assert_allclose(got, want, atol=2e-4 * want.max())

    A_sep = np.asarray(prf.design_matrix(
        jnp2.asarray(stars[:, 0], jnp2.float32),
        jnp2.asarray(stars[:, 1], jnp2.float32), (13, 13), 5.0))
    want_A = np.asarray(frac.reshape(13 * 13, 2))
    np.testing.assert_allclose(A_sep, want_A, atol=2e-4)


def test_spline_zoom_matches_scipy_ndimage():
    """The background-mesh interpolator reproduces photutils'
    BkgZoomInterpolator — scipy.ndimage.zoom(order=3, mode='reflect',
    grid_mode=True) — to f32 precision (reference backgrounds.py:199 via
    photutils.Background2D)."""
    from scipy import ndimage
    from photometry_tpu.ops.zoom import spline_zoom

    rng = np.random.default_rng(11)
    for (h, w), (H, W) in [((32, 32), (2048, 2048)), ((7, 9), (448, 576)),
                           ((5, 5), (37, 41))]:
        mesh = rng.normal(100.0, 10.0, (h, w))
        want = ndimage.zoom(mesh, (H / h, W / w), order=3, mode="reflect",
                            grid_mode=True)
        got = np.asarray(spline_zoom(mesh.astype(np.float32), (H, W)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
