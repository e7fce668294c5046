"""Plot regression tests against stored baselines.

Counterpart of the reference's pytest-mpl image comparisons
(tests/test_plots.py:23-46, baselines in tests/correct_plots/).  pytest-mpl
is not in this image, so the mechanism is self-contained: each figure is
rasterised, mean-pooled to a 32x32 grayscale thumbnail and compared to a
committed baseline (tests/baselines/*.npz) with a tolerance that catches
layout/colormap/orientation regressions while ignoring font rasterisation
details.  Regenerate baselines with::

    python -m pytest tests/test_plot_regression.py --force-regen  (env
    PHOTOMETRY_TPU_REGEN_BASELINES=1)
"""

import os

import numpy as np
import pytest

BASELINE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baselines")
REGEN = os.environ.get("PHOTOMETRY_TPU_REGEN_BASELINES") == "1"
TOL = 12.0  # mean |delta| on the 0..255 thumbnail


def _thumbnail(fig) -> np.ndarray:
    """Rasterise a figure and mean-pool to a 32x32 grayscale uint8 array."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].astype(np.float64)
    gray = buf.mean(axis=2)
    H, W = gray.shape
    hs, ws = H // 32, W // 32
    gray = gray[:hs * 32, :ws * 32].reshape(32, hs, 32, ws).mean(axis=(1, 3))
    return gray


def _check(name: str, fig):
    got = _thumbnail(fig)
    path = os.path.join(BASELINE_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(BASELINE_DIR, exist_ok=True)
        np.savez_compressed(path, thumbnail=got)
        if not REGEN:
            pytest.skip(f"baseline {name} generated; rerun to compare")
    want = np.load(path)["thumbnail"]
    delta = float(np.abs(got - want).mean())
    assert delta < TOL, f"{name}: thumbnail deviation {delta:.2f} > {TOL}"


def _demo_image(seed=5, n=64):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    img = 100 + 2.0 * rng.standard_normal((n, n))
    for cy, cx, f in [(20, 22, 5e3), (40, 45, 2e4), (50, 12, 1e3)]:
        img += f * np.exp(-0.5 * ((yy - cy) ** 2 + (xx - cx) ** 2) / 1.4 ** 2)
    return img


@pytest.mark.parametrize("scale", ["linear", "log", "sqrt"])
def test_plot_image_scales(scale):
    from photometry_tpu.plots import plot_image, plt
    fig, ax = plt.subplots(figsize=(4, 4))
    plot_image(_demo_image(), ax=ax, scale=scale, cbar="right")
    _check(f"plot_image_{scale}", fig)
    plt.close(fig)


def test_plot_image_fit_residuals():
    from photometry_tpu.plots import plot_image_fit_residuals, plt
    img = _demo_image()
    fit = _demo_image(seed=5) * 0.95
    fig = plt.figure(figsize=(9, 3))
    plot_image_fit_residuals(fig, img, fit)
    _check("plot_image_fit_residuals", fig)
    plt.close(fig)


def test_plot_outline():
    from photometry_tpu.plots import plot_image, plot_outline, plt
    img = _demo_image()
    mask = img > 500
    fig, ax = plt.subplots(figsize=(4, 4))
    plot_image(img, ax=ax, scale="log")
    plot_outline(mask, ax=ax, color="r")
    _check("plot_outline", fig)
    plt.close(fig)


def test_regression_mechanism_detects_change(tmp_path, monkeypatch):
    """The comparator actually fails on a materially different figure."""
    from photometry_tpu.plots import plot_image, plt
    monkeypatch.setitem(globals(), "BASELINE_DIR", str(tmp_path))
    fig, ax = plt.subplots(figsize=(4, 4))
    plot_image(_demo_image(), ax=ax, scale="log")
    base = _thumbnail(fig)
    plt.close(fig)
    fig2, ax2 = plt.subplots(figsize=(4, 4))
    plot_image(np.zeros((64, 64)) + 1.0, ax=ax2, scale="linear")
    other = _thumbnail(fig2)
    plt.close(fig2)
    assert np.abs(base - other).mean() > TOL
