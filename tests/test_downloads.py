"""Tests of the download helpers (file:// URLs only — no egress here)."""

import os

import numpy as np
import pytest

from photometry_tpu.utils.downloads import download_file, download_parallel


def test_download_file_and_parallel(tmp_path):
    src = tmp_path / "src.bin"
    payload = os.urandom(4096)
    src.write_bytes(payload)
    url = "file://" + str(src)
    dest = str(tmp_path / "out" / "dst.bin")
    assert download_file(url, dest) == dest
    assert open(dest, "rb").read() == payload

    jobs = [(url, str(tmp_path / f"multi/{i}.bin")) for i in range(3)]
    out = download_parallel(jobs, workers=2)
    assert all(os.path.exists(p) for p in out)


def test_download_failure_raises(tmp_path):
    with pytest.raises(OSError):
        download_file("file:///nonexistent/nope.bin", str(tmp_path / "x"),
                      retries=2, backoff=0.01)


def test_download_catalogs_from_template(tmp_path, monkeypatch):
    from photometry_tpu.catalog import download_catalogs, catalog_filename
    # Build a fake 'server' directory with one catalog file:
    server = tmp_path / "server"
    server.mkdir()
    fake = server / catalog_filename(1, 3, 2)
    fake.write_bytes(b"sqlite-placeholder")
    monkeypatch.setenv("PHOTOMETRY_TPU_CATALOG_URL",
                       "file://" + str(server) + "/catalog_sector{sector:03d}_camera{camera}_ccd{ccd}.sqlite")
    dest = tmp_path / "input"
    dest.mkdir()
    got = download_catalogs(str(dest), 1, camera=3, ccd=2)
    assert len(got) == 1 and os.path.exists(got[0])
    # Second call: already present, no re-download:
    got2 = download_catalogs(str(dest), 1, camera=3, ccd=2)
    assert got2 == got


def test_catalog_cmd_builds_from_tic_extract(tmp_path):
    """run_make_catalog CLI parity (reference run_make_catalog.py:69):
    builds catalog sqlite files from a TIC extract file."""
    from photometry_tpu.cli import catalog_cmd
    from photometry_tpu.catalog import StarCatalog, catalog_filename

    rng = np.random.default_rng(5)
    n = 25
    src = str(tmp_path / "tic.npz")
    np.savez(src, starid=np.arange(1, n + 1), ra=rng.uniform(10, 12, n),
             dec=rng.uniform(-40, -38, n), pm_ra=rng.normal(0, 10, n),
             pm_dec=rng.normal(0, 10, n), tmag=rng.uniform(6, 14, n))
    d = str(tmp_path / "input")
    os.makedirs(d)
    code = catalog_cmd.main(["-q", "--camera", "3", "--ccd", "2",
                             "--tic-source", src, "1", d])
    assert code == 0
    path = os.path.join(d, catalog_filename(1, 3, 2))
    assert os.path.exists(path)
    cat = StarCatalog(path)
    stars = cat.all_stars()
    assert len(stars["starid"]) == n
    cat.close()


def test_catalog_cmd_settings_url(tmp_path, monkeypatch):
    """[catalog] url settings key fetches prebuilt catalogs (mirror of the
    [timecorr] ephemeris_url mechanism)."""
    import configparser
    from photometry_tpu.catalog import catalog_filename, download_catalogs
    from photometry_tpu.io import settings as io_settings

    server = tmp_path / "server"
    server.mkdir()
    (server / catalog_filename(2, 1, 1)).write_bytes(b"sqlite-placeholder")
    ini = tmp_path / "settings.ini"
    base = io_settings.load_settings()
    cfg = configparser.ConfigParser()
    cfg.read_dict({s: dict(base.items(s)) for s in base.sections()})
    cfg["catalog"]["url"] = ("file://" + str(server)
                             + "/catalog_sector{sector:03d}_camera{camera}_ccd{ccd}.sqlite")
    with open(ini, "w") as fh:
        cfg.write(fh)
    monkeypatch.setenv("PHOTOMETRY_TPU_SETTINGS", str(ini))
    monkeypatch.delenv("PHOTOMETRY_TPU_CATALOG_URL", raising=False)
    io_settings.load_settings.cache_clear()
    try:
        d = tmp_path / "input"
        d.mkdir()
        got = download_catalogs(str(d), 2, camera=1, ccd=1)
        assert len(got) == 1 and os.path.exists(got[0])
    finally:
        io_settings.load_settings.cache_clear()


def test_catalog_cmd_no_source_errors(tmp_path, monkeypatch):
    from photometry_tpu.cli import catalog_cmd
    monkeypatch.delenv("PHOTOMETRY_TPU_CATALOG_URL", raising=False)
    d = str(tmp_path / "empty")
    os.makedirs(d)
    assert catalog_cmd.main(["-q", "--camera", "1", "--ccd", "1", "3", d]) == 1
