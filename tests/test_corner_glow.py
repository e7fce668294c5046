"""Small-frame corner-glow stress regression.

Round-2 stress sims found that on 96-160 px frames the camera-centre radial
model never engages (all radii < 2400 px), the tile mesh's edge extrapolation
undershoots a steep glow corner by up to ~20 e-/s, and a faint star sitting
there could over-collect ~10x flux with contamination 0.  The fix is the
corner-ring fallback in ops.background.estimate_background (rings about the
max-camera-radius frame corner, step scaled to the diagonal).  These tests
pin that behavior.  Reference radial model: backgrounds.py:121-206.
"""

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.ops.background import estimate_background, radial_coordinates
from photometry_tpu.core.status import STATUS


def _glow_corner(shape, camera, ccd):
    H, W = shape
    rim = radial_coordinates(shape, camera, ccd)
    corners = {(0, 0): rim[0, 0], (0, W - 1): rim[0, -1],
               (H - 1, 0): rim[-1, 0], (H - 1, W - 1): rim[-1, -1]}
    return max(corners, key=corners.get)


@pytest.mark.parametrize("shape,amp", [((96, 96), 80.0), ((160, 160), 120.0)])
def test_small_frame_corner_glow_recovered(shape, amp):
    """Steep corner glow on a sub-CCD frame is recovered within noise."""
    cfg = SimConfig(shape=shape, n_times=3, n_stars=10, glow_amp=amp, seed=11)
    sim = simulate_sector(cfg)
    rim = radial_coordinates(shape, cfg.camera, cfg.ccd)
    bkg, _ = estimate_background(sim.images[0], radius_image=rim, tile=16)
    res = np.asarray(bkg) - sim.bkg_true[0]
    H, W = shape
    gy, gx = _glow_corner(shape, cfg.camera, cfg.ccd)
    sl = (slice(0, 16) if gy == 0 else slice(H - 16, H),
          slice(0, 16) if gx == 0 else slice(W - 16, W))
    corner = res[sl]
    # pre-fix: corner_mean ~ -18 e-/s at amp=80; now within noise:
    assert abs(np.nanmean(corner)) < 2.0
    assert np.nanmax(np.abs(corner)) < 10.0
    assert np.sqrt(np.nanmean(res ** 2)) < 1.5


def test_corner_star_no_overcollection(tmp_path):
    """A faint star in the steep glow corner extracts ~its true flux.

    Pre-fix the under-subtracted glow flooded the noise floor and the K2P2
    mask grew to over-collect ~10x with contamination 0.
    """
    from photometry_tpu.prepare import prepare_photometry
    from photometry_tpu.core.engine import SectorContext, extract_aperture_batch

    d = str(tmp_path)
    shape = (96, 96)
    gy, gx = _glow_corner(shape, 3, 2)
    crow = 6.0 if gy == 0 else shape[0] - 7.0
    ccol = 6.0 if gx == 0 else shape[1] - 7.0
    stars = ((crow, ccol, 12.5),             # faint star in the glow corner
             (48.0, 30.0, 9.0),
             (70.0, 60.0, 10.5),
             (25.0, 55.0, 11.5))
    cfg = SimConfig(shape=shape, n_times=12, glow_amp=80.0, seed=13,
                    stars=stars)
    sim = simulate_sector(cfg)
    sim.write_ffis(d)
    sim.write_catalog(d)
    prepare_photometry(d)

    ctx = SectorContext(d, 1, 3, 2)
    # stars are sorted brightest-first; the corner star is tmag 12.5 = last
    idx = int(np.argmax(sim.tmag))
    assert sim.row_ref[idx] == crow and sim.col_ref[idx] == ccol
    res = extract_aperture_batch(ctx, [int(sim.starid[idx])])[0]
    assert res.status in (STATUS.OK, STATUS.WARNING)
    ratio = np.nanmedian(res.lightcurve["flux"] / sim.flux_true[idx])
    # aperture photometry loses some wing flux; what it must NOT do is
    # collect a noise-flooded mega-mask (pre-fix ratio ~10):
    assert 0.6 < ratio < 1.4, f"corner-star flux ratio {ratio:.2f}"
    assert res.details["mask_size"] < 40
