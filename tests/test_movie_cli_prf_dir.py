"""Tests: movie CLI, PRF directory-layout loading, iter_frames loader."""

import os

import numpy as np
import pytest

from photometry_tpu.sim.simulator import SimConfig, simulate_sector


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mcli"))
    sim = simulate_sector(SimConfig(shape=(64, 64), n_times=5, n_stars=8, seed=77))
    sim.write_ffis(d)
    sim.write_catalog(d)
    from photometry_tpu.prepare import prepare_photometry
    prepare_photometry(d)
    return sim, d


def test_movie_cli(prepared, tmp_path):
    sim, d = prepared
    from photometry_tpu.cli import movie_cmd
    assert movie_cmd.main(["-q", "--frames", "2", d]) == 0
    import glob
    assert glob.glob(os.path.join(d, "*images.gif"))
    # no cubes found -> exit 1:
    assert movie_cmd.main(["-q", str(tmp_path)]) == 1


def test_prf_directory_layout(tmp_path):
    """context_prf finds PRF .mat files laid out like the reference data dir."""
    from photometry_tpu.models.prf import PRF
    oversample, radius = 9, 8.0
    n = int(radius * oversample)
    offs = np.arange(-n, n + 1) / oversample
    g = np.exp(-0.5 * (offs[:, None] ** 2 + offs[None, :] ** 2) / 1.1 ** 2)
    g /= g.sum() * (1 / oversample) ** 2
    subdir = tmp_path / "start_s0001"
    subdir.mkdir()
    PRF.write_mat(str(subdir / "tess2018-3-2-characterized-prf.mat"),
                  [g], ccd_columns=[1024.0], ccd_rows=[1024.0])
    prf = PRF.from_mat(str(tmp_path), sector=1, camera=3, ccd=2, stamp=(0, 15, 0, 15))
    img = np.asarray(prf.integrate_to_image(np.array([[7.0, 7.0, 100.0]]),
                                            (15, 15), cutoff_radius=None))
    assert img.sum() == pytest.approx(100.0, rel=0.01)
    # Missing camera/ccd -> FileNotFoundError:
    with pytest.raises(FileNotFoundError):
        PRF.from_mat(str(tmp_path), sector=1, camera=1, ccd=1, stamp=(0, 15, 0, 15))
    # Sector >= 4 uses the other epoch directory:
    with pytest.raises(FileNotFoundError):
        PRF.from_mat(str(tmp_path), sector=5, camera=3, ccd=2, stamp=(0, 15, 0, 15))


def test_iter_frames_order_and_content(prepared):
    sim, d = prepared
    from photometry_tpu.io.discovery import find_ffi_files
    from photometry_tpu.io.loader import iter_frames
    from photometry_tpu.io.tess import read_ffi
    files = find_ffi_files(d)
    frames = list(iter_frames(files, workers=3, prefetch=2))
    assert len(frames) == len(files)
    for f, path in zip(frames, files):
        direct = read_ffi(path)
        np.testing.assert_array_equal(f.data, direct.data)
        assert f.cadenceno == direct.cadenceno
    # workers=1 falls back to the sequential path:
    seq = list(iter_frames(files, workers=1))
    assert len(seq) == len(files)


def test_combined_movie_cli(prepared):
    """--combined renders the 16-CCD focal-plane mosaic movie
    (run_ffimovie.py:214-378 counterpart); missing CCDs show as blank
    blocks."""
    sim, d = prepared
    import glob
    from photometry_tpu.cli import movie_cmd
    from photometry_tpu.movie import mosaic_frame
    assert movie_cmd.main(["-q", "--combined", "--frames", "2", d]) == 0
    gifs = glob.glob(os.path.join(d, "*combined_images.gif"))
    assert gifs and os.path.getsize(gifs[0]) > 1000
    m = mosaic_frame(d, 1, 0)
    # one 64x64 CCD present -> 4x4 grid of 64-px blocks, others NaN:
    assert m.shape == (256, 256)
    assert np.isfinite(m[128:192, 64:128]).all()   # camera 3, ccd 2 block
    assert np.isnan(m[:64, :64]).all()


def test_mp4_capability_gate(prepared, monkeypatch):
    """fmt='mp4' encodes through ffmpeg when present; raises a clear error
    otherwise (reference writes MP4s, run_ffimovie.py:66-211; this image
    has no ffmpeg, so the error path is the one exercised for real)."""
    import shutil
    from photometry_tpu import movie
    from photometry_tpu.io.discovery import find_cube_files

    sim, d = prepared
    cube = find_cube_files(d)[0]
    if shutil.which("ffmpeg"):
        out = movie.make_movie(cube, fmt="mp4", max_frames=2, fps=2)
        assert out.endswith(".mp4") and os.path.getsize(out) > 0
    else:
        assert not movie.ffmpeg_available()
        with pytest.raises(RuntimeError, match="ffmpeg"):
            movie.make_movie(cube, fmt="mp4", max_frames=2)

    # and the gate is purely capability-based:
    monkeypatch.setattr(shutil, "which", lambda _: None)
    assert not movie.ffmpeg_available()


def test_movie_cli_process_shard(prepared, monkeypatch):
    """Static multi-host split of the cube list (movie_cmd --process-id /
    --num-processes; reference run_ffimovie.py pools locally only)."""
    sim, d = prepared
    from photometry_tpu.cli import movie_cmd
    seen = []
    monkeypatch.setattr("photometry_tpu.movie.make_movie",
                        lambda cube, **kw: seen.append(cube) or f"{cube}.gif")
    # One cube in the sim: shard 0/2 renders it, shard 1/2 is a no-op.
    assert movie_cmd.main(["-q", "--process-id", "0", "--num-processes", "2",
                           d]) == 0
    assert len(seen) == 1
    assert movie_cmd.main(["-q", "--process-id", "1", "--num-processes", "2",
                           d]) == 0
    assert len(seen) == 1
    with pytest.raises(SystemExit):
        movie_cmd.main(["-q", "--process-id", "0", d])
