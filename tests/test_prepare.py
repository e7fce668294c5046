"""Tests of the prepare stage (FFI -> cube) against simulator truth."""

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.prepare import prepare_photometry, prepare_one, quality_from_tpf
from photometry_tpu.io.cube import ImageCube
from photometry_tpu.quality import PixelQualityFlags, TESSQualityFlags


@pytest.fixture(scope="module")
def sim():
    return simulate_sector(SimConfig(shape=(96, 96), n_times=16, n_stars=25, seed=11))


@pytest.fixture(scope="module")
def prepared(sim, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prep"))
    sim.write_ffis(d)
    sim.write_tpf(d, int(sim.starid[0]), n_times=200)
    paths = prepare_photometry(d)
    assert len(paths) == 1
    return sim, paths[0]


def test_cube_basics(prepared):
    sim, path = prepared
    with ImageCube(path) as cube:
        assert cube.n_times == 16
        assert cube.shape == (96, 96)
        np.testing.assert_allclose(cube.time, sim.time, atol=1e-9)
        np.testing.assert_array_equal(cube.cadenceno, sim.cadenceno)
        assert cube.header["CADENCE"] == 1800
        for stage in ("backgrounds", "images", "shenanigans", "quality_tpf", "wcs_ref"):
            assert cube.is_done(stage)


def test_background_recovery(prepared):
    """Estimated background must track the injected truth within the noise."""
    sim, path = prepared
    with ImageCube(path) as cube:
        bkg = cube.backgrounds()
    # Compare away from the borders (tile upsampling edge effects):
    resid = (bkg - sim.bkg_true)[:, 10:-10, 10:-10]
    assert abs(np.median(resid)) < 1.5
    assert np.percentile(np.abs(resid), 90) < 6.0


def test_images_are_background_subtracted(prepared):
    sim, path = prepared
    with ImageCube(path) as cube:
        imgs = cube.images()
    # In star-free regions the residual flux should be ~0:
    star_free = np.ones((96, 96), bool)
    rr = np.round(sim.row_ref).astype(int)
    cc = np.round(sim.col_ref).astype(int)
    for r, c in zip(rr, cc):
        star_free[max(0, r - 6):r + 7, max(0, c - 6):c + 7] = False
    vals = imgs[:, star_free][:, 10:]
    assert abs(np.nanmedian(vals)) < 1.5


def test_sumimage(prepared):
    sim, path = prepared
    with ImageCube(path) as cube:
        s = cube.sumimage
        q = cube.quality
    # Sumimage averages only quality-good frames:
    assert np.isfinite(s).all()
    # Stars stand out in the sumimage:
    r, c = int(round(sim.row_ref[0])), int(round(sim.col_ref[0]))
    assert s[r, c] > 50 * np.median(s)


def test_wcs_reference_frame(prepared):
    sim, path = prepared
    with ImageCube(path) as cube:
        ref = int(cube.attrs["WCS_REF_FRAME"])
        q = cube.quality
        assert q[ref] == 0
        w = cube.reference_wcs()
        ra, dec = w.radec_of_rowcol(sim.row_ref[:2], sim.col_ref[:2])
        ra0, dec0 = sim.wcs.radec_of_rowcol(sim.row_ref[:2], sim.col_ref[:2])
        np.testing.assert_allclose(ra, ra0, atol=1e-8)


def test_quality_headers_propagated(prepared):
    sim, path = prepared
    with ImageCube(path) as cube:
        q = cube.quality
    # Simulator set Desat at T//4 and CoarsePoint at T//2 in FFI headers:
    assert q[4] & TESSQualityFlags.Desat
    assert q[8] & TESSQualityFlags.CoarsePoint


def test_prepare_is_resumable(prepared):
    sim, path = prepared
    import os
    d = os.path.dirname(path)
    mtime = os.path.getmtime(path)
    # Second run must be a cheap no-op (all stages done):
    paths = prepare_photometry(d)
    assert paths == [path]
    with ImageCube(path) as cube:
        assert cube.is_done("images")


def test_quality_from_tpf(sim, tmp_path):
    # Build a TPF whose quality has a Desat flag in a known time range,
    # then check the transfer masks only FFI-relevant bits:
    path = sim.write_tpf(str(tmp_path), int(sim.starid[1]), n_times=100)
    t_start = sim.time - 900 / 86400
    t_end = sim.time + 900 / 86400
    q = quality_from_tpf(path, t_start, t_end)
    assert q.shape == (16,)
    assert np.all((q & ~TESSQualityFlags.FFI_RELEVANT_BITMASK) == 0)


def test_smooth_backgrounds_in_place_matches_global(tmp_path):
    """The in-place streamed smoothing must match one-shot smoothing.

    The carry logic matters: writing block k's smoothed output overwrites
    the raw frames block k+1 needs as its left halo, so the helper carries
    them in host memory.  Tolerance covers only blocked-vs-full cumsum f32
    rounding (the windows themselves are identical).
    """
    import jax.numpy as jnp
    from photometry_tpu.ops.filters import time_moving_nanmean
    from photometry_tpu.prepare import _smooth_backgrounds_in_place
    rng = np.random.default_rng(5)
    T, H, W = 17, 24, 24
    raw = (100 + 10 * rng.standard_normal((T, H, W))).astype(np.float32)
    raw[3, 5, 5] = np.nan  # nanmean semantics cross the halo boundary
    expected = np.asarray(time_moving_nanmean(jnp.asarray(raw), 3))
    path = str(tmp_path / "smooth.h5")
    cube = ImageCube.create(path, T, (H, W))
    cube.write_block("backgrounds", 0, raw)
    _smooth_backgrounds_in_place(cube, window=3, chunk=4)
    got = cube.backgrounds()
    cube.close()
    np.testing.assert_allclose(got, expected, rtol=2e-6, atol=1e-4)


def test_streamed_chunks_match_single_shot(tmp_path_factory):
    """Chunked streaming (chunk < T) must match the one-shot path.

    Stage 1 now writes raw backgrounds to the cube and re-reads halo'd
    blocks for the time smoothing, and stage 3 spills residuals to an
    on-disk scratch dataset.  XLA compiles different reduction orders for
    different batch shapes, so f32 results agree only to rounding — the
    tolerance here bounds that; the plumbing (halos, carry, scratch) would
    show up as O(1) errors.
    """
    small = simulate_sector(SimConfig(shape=(64, 64), n_times=14, n_stars=12,
                                      seed=21))
    cubes = {}
    for chunk in (4, 64):
        d = str(tmp_path_factory.mktemp(f"prepstream{chunk}"))
        small.write_ffis(d)
        cubes[chunk] = prepare_one(d, 1, 3, 2, chunk=chunk)
    with ImageCube(cubes[4]) as a, ImageCube(cubes[64]) as b:
        np.testing.assert_allclose(a.backgrounds(), b.backgrounds(),
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_array_equal(a.pixelflags(), b.pixelflags())
        np.testing.assert_allclose(np.nan_to_num(a.images()),
                                   np.nan_to_num(b.images()),
                                   rtol=1e-3, atol=0.05)
        assert "_scratch_resid" not in a.h5  # scratch cleaned up


def test_movement_kernel_stage(sim, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prepmk"))
    small = simulate_sector(SimConfig(shape=(64, 64), n_times=6, n_stars=15,
                                      seed=3, jitter_amp=0.3))
    small.write_ffis(d)
    path = prepare_one(d, 1, 3, 2, calc_movement_kernel=True)
    with ImageCube(path) as cube:
        assert cube.is_done("movement")
        k = np.asarray(cube.h5["movement_kernel"])
        assert k.shape == (6, 2)
        ref = int(cube.h5["movement_kernel"].attrs["ref_frame"])
        # Kernel at the reference frame ~ 0; elsewhere tracks injected jitter
        # (dx = dcol, dy = drow) to ~0.05 px:
        np.testing.assert_allclose(k[ref], [0, 0], atol=0.02)
        dcol = small.jitter[:, 1] - small.jitter[ref, 1]
        drow = small.jitter[:, 0] - small.jitter[ref, 0]
        np.testing.assert_allclose(k[:, 0], dcol, atol=0.08)
        np.testing.assert_allclose(k[:, 1], drow, atol=0.08)


def test_prepare_photometry_process_split(monkeypatch):
    """Static multi-host split of the CCD list (prepare_cmd --process-id /
    --num-processes; reference prepare.py:79-206 has no split — one rank
    does every CCD)."""
    from photometry_tpu import prepare as prep

    files = [f"ffi_1_{cam}_{ccd}.fits" for cam in (1, 2) for ccd in (1, 2)]
    monkeypatch.setattr(prep.discovery, "find_ffi_files", lambda d: files)
    monkeypatch.setattr(
        prep.discovery, "parse_ffi_filename",
        lambda f: dict(zip(("sector", "camera", "ccd"),
                           map(int, f[:-5].split("_")[1:]))))
    seen = []

    def fake_prepare_one(inp, sector, camera, ccd, output_folder=None, **kw):
        seen.append((sector, camera, ccd))
        return f"{sector}-{camera}-{ccd}"

    monkeypatch.setattr(prep, "prepare_one", fake_prepare_one)

    out0 = prep.prepare_photometry("x", process_id=0, process_count=2)
    out1 = prep.prepare_photometry("x", process_id=1, process_count=2)
    assert len(out0) == 2 and len(out1) == 2
    assert sorted(seen) == [(1, 1, 1), (1, 1, 2), (1, 2, 1), (1, 2, 2)]

    with pytest.raises(ValueError, match="together"):
        prep.prepare_photometry("x", process_id=0)

    # Auto-shard when the multihost layer is initialized:
    from photometry_tpu.parallel import multihost
    monkeypatch.setattr(multihost, "is_initialized", lambda: True)
    monkeypatch.setattr(multihost, "process_shard", lambda items: list(items)[1::2])
    seen.clear()
    out = prep.prepare_photometry("x")
    assert len(out) == 2 and seen == [(1, 1, 2), (1, 2, 2)]
