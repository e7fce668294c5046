"""Crowded-field catalog completeness: no star in a stamp is ever dropped.

Regression for the round-4 weakness: a fixed ``max_stars=48`` per-stamp
catalog cap silently discarded the faintest stars in >48-star stamps, so
``skip_targets``, ``contamination`` (reference photometry.py:222-250) and
watershed marker seeding (k2p2v2.py:89-288) lost them.  The width now
adapts to the most crowded stamp per retry round.
"""

import numpy as np
import pytest

from photometry_tpu.core.engine import SectorContext, extract_aperture_batch
from photometry_tpu.core.status import STATUS
from photometry_tpu.prepare import prepare_photometry
from photometry_tpu.sim.simulator import SimConfig, simulate_sector

TARGET_RC = (64.0, 64.0)
TARGET_TMAG = 9.0
#: Two in-mask neighbours INSIDE the target's central pixel — fainter than
#: every other stamp star, so a brightest-48 cap would drop exactly them:
INMASK_OFFSETS = ((0.3, 0.2), (-0.4, 0.1))
INMASK_TMAG = 13.8


@pytest.fixture(scope="module")
def crowded(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("crowded"))
    rng = np.random.default_rng(7)
    stars = [(TARGET_RC[0], TARGET_RC[1], TARGET_TMAG)]
    # 55 mid-faint stars sprinkled through the stamp+buffer box but kept
    # >=5 px away from the target so they stay out of its mask:
    n_mid = 0
    while n_mid < 55:
        dr, dc = rng.uniform(-9, 9, 2)
        if np.hypot(dr, dc) < 5.0:
            continue
        stars.append((TARGET_RC[0] + dr, TARGET_RC[1] + dc,
                      float(rng.uniform(12.0, 12.9))))
        n_mid += 1
    for dr, dc in INMASK_OFFSETS:
        stars.append((TARGET_RC[0] + dr, TARGET_RC[1] + dc, INMASK_TMAG))
    sim = simulate_sector(SimConfig(shape=(128, 128), n_times=6, seed=3,
                                    stars=tuple(stars)))
    sim.write_ffis(d)
    sim.write_catalog(d)
    prepare_photometry(d)
    ctx = SectorContext(d, 1, 3, 2)
    target_sid = int(sim.starid[0])
    inmask_sids = [int(s) for s in sim.starid[-2:]]
    return sim, ctx, target_sid, inmask_sids


def _stars_in_box(sim, stamp, buffer_px=5.0):
    r0, r1, c0, c1 = stamp
    inside = ((sim.row_ref >= r0 - buffer_px) & (sim.row_ref <= r1 - 1 + buffer_px)
              & (sim.col_ref >= c0 - buffer_px) & (sim.col_ref <= c1 - 1 + buffer_px))
    return int(inside.sum())


def test_no_silent_star_loss_beyond_48(crowded):
    sim, ctx, target_sid, inmask_sids = crowded
    res = extract_aperture_batch(ctx, [target_sid])[0]
    assert res.status in (STATUS.OK, STATUS.WARNING)

    # Precondition: this stamp really holds more stars than the old cap.
    assert _stars_in_box(sim, res.details["stamp"]) > 48

    # The two faintest stars sit inside the target's central pixel, so they
    # are unconditionally inside the final mask -> both must be declared as
    # skip targets (reference photometry.py:222-250 uses EVERY stamp star):
    for sid in inmask_sids:
        assert sid in res.skip_targets, \
            f"in-mask star {sid} lost from skip_targets"

    # Contamination must equal the uncapped host-side reference formula
    # over all catalog stars whose position falls in the final mask:
    r0, r1, c0, c1 = res.details["stamp"]
    mask = res.mask
    mags = []
    for row, col, tmag in zip(sim.row_ref, sim.col_ref, sim.tmag):
        rr, cc = int(np.rint(row - r0)), int(np.rint(col - c0))
        if 0 <= rr < mask.shape[0] and 0 <= cc < mask.shape[1] and mask[rr, cc]:
            mags.append(tmag)
    assert len(mags) >= 3  # target + the two planted neighbours
    mags_total = -2.5 * np.log10(np.nansum(10.0 ** (-0.4 * np.asarray(mags))))
    expected = max(1.0 - 10.0 ** (0.4 * (mags_total - TARGET_TMAG)), 0.0)
    assert res.details["contamination"] == pytest.approx(expected, rel=1e-5)


def test_explicit_cap_reproduces_old_loss(crowded):
    """With an explicit max_stars=48 the faintest in-mask stars vanish —
    documenting the failure mode the adaptive default now prevents."""
    sim, ctx, target_sid, inmask_sids = crowded
    res = extract_aperture_batch(ctx, [target_sid], max_stars=48)[0]
    assert res.status in (STATUS.OK, STATUS.WARNING)
    assert all(sid not in res.skip_targets for sid in inmask_sids)
