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
