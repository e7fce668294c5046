"""Tests of connected components, watershed, and background estimation."""

import numpy as np
import pytest

from photometry_tpu.ops.labeling import label_components, watershed_segment
from photometry_tpu.ops.background import estimate_background
from photometry_tpu.ops.filters import gaussian_blur2d


def test_label_components_basic():
    m = np.zeros((12, 12), bool)
    m[1:3, 1:3] = True          # component 1
    m[5:8, 5:8] = True          # component 2
    m[10, 10] = True            # component 3
    m[9, 9] = True              # diagonal touch -> same component (8-conn)
    lab = np.asarray(label_components(m))
    assert lab[0, 0] == 0
    ids = sorted(set(lab[m]))
    assert len(ids) == 3
    assert lab[9, 9] == lab[10, 10]
    assert lab[1, 1] != lab[5, 5]
    # 4-connectivity splits the diagonal pair:
    lab4 = np.asarray(label_components(m, connectivity=1))
    assert lab4[9, 9] != lab4[10, 10]
    assert len(set(lab4[m])) == 4


def test_label_components_deterministic_order():
    m = np.zeros((8, 8), bool)
    m[6, 6] = True
    m[1, 1] = True
    lab = np.asarray(label_components(m))
    # Labels ordered by smallest flat index: (1,1) -> 1, (6,6) -> 2
    assert lab[1, 1] == 1 and lab[6, 6] == 2


def _two_star_image(sep=6.0, flux2=0.6):
    yy, xx = np.mgrid[0:25, 0:25].astype(np.float32)
    img = (np.exp(-0.5 * ((xx - 9) ** 2 + (yy - 12) ** 2) / 1.6)
           + flux2 * np.exp(-0.5 * ((xx - 9 - sep) ** 2 + (yy - 12) ** 2) / 1.6))
    return img


def test_watershed_splits_blend():
    img = _two_star_image()
    blurred = np.asarray(gaussian_blur2d(img, sigma=1.0))
    mask = img > 0.05
    markers = np.zeros((25, 25), np.int32)
    markers[12, 9] = 1
    markers[12, 15] = 2
    lab = np.asarray(watershed_segment(blurred, markers, mask))
    assert lab[12, 9] == 1 and lab[12, 15] == 2
    # Everything in the mask is assigned:
    assert np.all(lab[mask] > 0)
    # The boundary between basins falls near the flux valley (x ~ 12.6 for
    # flux ratio 0.6 at separation 6):
    row = lab[12]
    split = np.where(np.diff(row[mask[12]]) != 0)[0]
    xs = np.where(mask[12])[0]
    boundary_x = xs[split[0]] if len(split) else -1
    assert 11 <= boundary_x <= 14


def test_background_tiled_only():
    """Non-TESS geometry: only the tiled component runs (bkgiters=1)."""
    rng = np.random.default_rng(6)
    H = W = 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    truth = 100.0 * (1 + 0.2 * xx / W - 0.1 * yy / H)
    img = truth + rng.normal(0, 2.0, (H, W))
    # Sprinkle stars:
    for _ in range(30):
        r, c = rng.integers(5, H - 5, 2)
        img[r - 1:r + 2, c - 1:c + 2] += 500.0
    bkg, mask_used = estimate_background(img.astype(np.float32), tile=32)
    bkg = np.asarray(bkg)
    resid = (bkg - truth)[8:-8, 8:-8]
    assert np.abs(np.median(resid)) < 1.0
    assert np.percentile(np.abs(resid), 95) < 3.0


def test_background_with_radial_component():
    """Corner glow + gradient, radius image supplied explicitly."""
    rng = np.random.default_rng(7)
    H = W = 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    r_img = np.hypot(xx + 3000, yy + 1500)  # far 'camera centre' like TESS
    glow = 80.0 * np.exp(-(r_img - r_img.min()) / 150.0)
    truth = 100.0 + glow
    img = truth + rng.normal(0, 2.0, (H, W))
    for _ in range(25):
        r, c = rng.integers(5, H - 5, 2)
        img[r - 1:r + 2, c - 1:c + 2] += 800.0
    bkg, _ = estimate_background(img.astype(np.float32), radius_image=r_img,
                                 radial_cutoff=float(r_img.min()),
                                 radial_pixel_step=15, tile=32)
    bkg = np.asarray(bkg)
    resid = (bkg - truth)[8:-8, 8:-8]
    assert np.abs(np.median(resid)) < 1.0
    assert np.percentile(np.abs(resid), 95) < 4.0


def test_background_batched_over_time():
    rng = np.random.default_rng(8)
    T, H, W = 4, 64, 64
    scale = 1.0 + 0.1 * np.arange(T)
    truth = 50.0 * scale[:, None, None] * np.ones((T, H, W))
    imgs = truth + rng.normal(0, 1.0, (T, H, W))
    bkg, _ = estimate_background(imgs.astype(np.float32), tile=16)
    bkg = np.asarray(bkg)
    for k in range(T):
        assert np.abs(np.median(bkg[k] - truth[k])) < 0.5


def test_background_fully_masked_frame():
    img = np.full((64, 64), -5.0, np.float32)  # all pixels negative -> masked
    bkg, mask = estimate_background(img, tile=16)
    assert np.all(np.asarray(mask))
    assert np.all(np.isnan(np.asarray(bkg)))


def test_background_masks_bright_pixels():
    img = np.full((64, 64), 10.0, np.float32)
    img[10, 10] = 9e4  # above flux_cutoff
    img[20, 20] = np.nan
    _, mask = estimate_background(img, tile=16)
    mask = np.asarray(mask)
    assert mask[10, 10] and mask[20, 20]
    assert not mask[30, 30]
