"""Tests of the simulator + TESS readers + discovery + catalog + cube store.

This closes the loop that the reference covers with bundled real data
(tests/input/): our simulator generates SPOC-layout products, and the io
stack must read them back consistently with the injected truth.
"""

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector
from photometry_tpu.io import discovery
from photometry_tpu.io.tess import read_ffi, read_tpf
from photometry_tpu.io.cube import ImageCube, cube_filename
from photometry_tpu.catalog import StarCatalog


@pytest.fixture(scope="module")
def sim():
    return simulate_sector(SimConfig(shape=(96, 96), n_times=12, n_stars=20, seed=7))


@pytest.fixture(scope="module")
def sim_dir(sim, tmp_path_factory):
    d = tmp_path_factory.mktemp("simdata")
    sim.write_ffis(str(d))
    sim.write_catalog(str(d))
    sim.write_tpf(str(d), int(sim.starid[0]), n_times=30)
    return str(d)


def test_truth_shapes(sim):
    assert sim.images.shape == (12, 96, 96)
    assert sim.flux_true.shape == (20, 12)
    assert np.all(np.isfinite(sim.images))
    # Stars must actually be present: total flux above background:
    excess = sim.images[0].sum() - sim.bkg_true[0].sum()
    assert excess > 0.5 * sim.flux_true[:, 0].sum()


def test_ffi_discovery_and_read(sim, sim_dir):
    files = discovery.find_ffi_files(sim_dir, sector=1, camera=3, ccd=2)
    assert len(files) == 12
    assert discovery.find_ffi_files(sim_dir, sector=2) == []
    frame = read_ffi(files[0])
    assert frame.data.shape == (96, 96)
    assert frame.header["DATA_REL"] == 99
    assert frame.cadenceno == 4697
    np.testing.assert_allclose(frame.data, sim.images[0], rtol=1e-6)
    np.testing.assert_allclose(frame.mid_time, sim.time[0], atol=1e-9)
    # WCS read from the image extension must reproduce star positions:
    ra, dec = frame.wcs.radec_of_rowcol(sim.row_ref[:3], sim.col_ref[:3])
    ra0, dec0 = sim.wcs.radec_of_rowcol(sim.row_ref[:3], sim.col_ref[:3])
    np.testing.assert_allclose(ra, ra0, atol=1e-8)


def test_raw_geometry_crop(sim, tmp_path):
    paths = sim.write_ffis(str(tmp_path), raw_geometry=True, gzip=False)
    frame = read_ffi(paths[0])
    assert frame.is_tess
    assert frame.data.shape == (2048, 2136 - 88)
    # science area content preserved at the crop offset:
    np.testing.assert_allclose(frame.data[:96, :96], sim.images[0], rtol=1e-6)
    assert frame.smear is not None and frame.smear.shape[0] == 10


def test_tpf_read(sim, sim_dir):
    sid = int(sim.starid[0])
    files = discovery.find_tpf_files(sim_dir, starid=sid)
    assert len(files) == 1
    tpf = read_tpf(files[0])
    assert tpf.starid == sid
    assert tpf.sector == 1 and tpf.camera == 3 and tpf.ccd == 2
    assert tpf.cadence == 120
    assert tpf.flux.shape == (30, 11, 11)
    assert tpf.time.shape == (30,)
    # Stamp corner must be within the CCD and centred near the star:
    assert 0 <= tpf.corner_row <= 96 - 11
    r, c = tpf.wcs.rowcol_of_radec(np.array([sim.ra_j2000[0]]), np.array([sim.dec_j2000[0]]))
    # WCS is in stamp coordinates; star should be inside the stamp:
    assert -1 <= float(r[0]) + 0 <= 12
    # The central pixel of a sigma=1.1 Gaussian carries ~13% of the flux:
    med = np.median(tpf.flux, axis=0)
    assert med.max() > 0.08 * sim.mean_flux_true[0]
    # And the stamp total should be close to the full star flux + background:
    assert med.sum() == pytest.approx(sim.mean_flux_true[0], rel=0.15)


def test_catalog_roundtrip(sim, sim_dir):
    files = discovery.find_catalog_files(sim_dir, sector=1, camera=3, ccd=2)
    assert len(files) == 1
    with StarCatalog(files[0]) as cat:
        assert len(cat) == 20
        assert cat.settings.sector == 1
        t = cat.target(int(sim.starid[3]))
        assert t["tmag"] == pytest.approx(sim.tmag[3], abs=1e-5)
        # Catalog positions (at reference time) must land at the simulated
        # pixel positions through the WCS:
        row, col = sim.wcs.rowcol_of_radec(t["ra"], t["decl"])
        assert float(row[0]) == pytest.approx(sim.row_ref[3], abs=0.01)
        assert float(col[0]) == pytest.approx(sim.col_ref[3], abs=0.01)
        # Footprint query over the whole CCD finds everything:
        H, W = sim.config.shape
        corners = np.stack(sim.wcs.radec_of_rowcol(np.array([0, 0, H - 1., H - 1.]),
                                                   np.array([0, W - 1., W - 1., 0])), axis=1)
        res = cat.query_footprint(corners)
        assert len(res["starid"]) == 20
        # Constraint pushdown:
        res = cat.query_footprint(corners, constraints="tmag < 8")
        assert np.all(res["tmag"] < 8)
        # all_stars with faint limit:
        res = cat.all_stars(faint_limit=10.0)
        assert np.all(res["tmag"] < 10.0)


def test_catalog_missing_star(sim, sim_dir):
    files = discovery.find_catalog_files(sim_dir)
    with StarCatalog(files[0]) as cat:
        with pytest.raises(RuntimeError):
            cat.target(999999999)


def test_cube_store_roundtrip(sim, tmp_path):
    path = str(tmp_path / cube_filename(1, 3, 2))
    T, H, W = sim.images.shape
    with ImageCube.create(path, T, (H, W), header=sim.header) as cube:
        for k in range(T):
            cube.write_frame(k, image=sim.images[k], image_err=sim.uncert[k],
                             background=sim.bkg_true[k],
                             pixelflags=np.zeros((H, W), np.uint8),
                             wcs_str=sim.wcs.to_header().to_bytes().decode("ascii"))
        cube.write_vectors(time=sim.time, timecorr=np.zeros(T),
                           cadenceno=sim.cadenceno, quality=sim.quality)
        cube.write_sumimage(sim.images.mean(axis=0))
        cube.attrs["WCS_REF_FRAME"] = 0
        cube.mark_done("images")
        assert cube.is_done("images")
        assert not cube.is_done("backgrounds")

    with ImageCube(path) as cube:
        assert cube.n_times == T
        assert cube.shape == (H, W)
        assert cube.header["SECTOR"] == 1
        np.testing.assert_allclose(cube.images(0, 3), sim.images[:3], rtol=1e-6)
        np.testing.assert_allclose(cube.time, sim.time)
        assert cube.is_done("images")
        w = cube.reference_wcs()
        ra1, dec1 = w.radec_of_rowcol(5.0, 7.0)
        ra0, dec0 = sim.wcs.radec_of_rowcol(5.0, 7.0)
        np.testing.assert_allclose(ra1, ra0, atol=1e-10)

    # Re-create without overwrite resumes the existing file:
    cube2 = ImageCube.create(path, T, (H, W))
    assert cube2.is_done("images")
    cube2.close()
    # Incompatible shape is rejected:
    with pytest.raises(ValueError):
        ImageCube.create(path, T + 1, (H, W))


def test_discovery_tpf_cadence_filter(sim, sim_dir, tmp_path):
    # fast TPF naming:
    p = sim.write_tpf(str(tmp_path), int(sim.starid[1]), cadence=20, n_times=10)
    assert "fast-tp" in p
    assert discovery.find_tpf_files(str(tmp_path), cadence=20) == [p]
    assert discovery.find_tpf_files(str(tmp_path), cadence=120) == []
    with pytest.raises(ValueError):
        discovery.find_tpf_files(str(tmp_path), cadence=60)


def test_raw_geometry_wcs_shifted_to_science(sim, tmp_path):
    """Flight-FFI convention (round-3 review find): the SPOC header WCS
    lives on the RAW 2078x2136 grid; read_ffi must shift it onto the
    cropped science grid, or every downstream aperture on real data would
    sit 44 columns off (the reference instead subtracts
    PIXEL_OFFSET_COLUMN at each access, BasePhotometry.py:857-860)."""
    paths = sim.write_ffis(str(tmp_path), raw_geometry=True, gzip=False)
    frame = read_ffi(paths[0])
    assert frame.is_tess
    # the raw-file header itself is raw-grid (science + 44 columns):
    from photometry_tpu.io import fits as pf
    from photometry_tpu.io.wcs import TanWCS
    hdus = pf.read_fits(paths[0])
    raw_wcs = TanWCS.from_header(hdus[1].header)
    # pick sky points from the science WCS truth (sim.wcs):
    ra, dec = sim.wcs.radec_of_rowcol(np.array([10.0, 50.0, 80.0]),
                                      np.array([5.0, 48.0, 90.0]))
    r_raw, c_raw = raw_wcs.rowcol_of_radec(ra, dec)
    np.testing.assert_allclose(c_raw, np.array([5.0, 48.0, 90.0]) + 44,
                               atol=1e-6)
    np.testing.assert_allclose(r_raw, [10.0, 50.0, 80.0], atol=1e-6)
    # ...but the ingested frame's WCS is science-grid:
    r, c = frame.wcs.rowcol_of_radec(ra, dec)
    np.testing.assert_allclose(r, [10.0, 50.0, 80.0], atol=1e-6)
    np.testing.assert_allclose(c, [5.0, 48.0, 90.0], atol=1e-6)
