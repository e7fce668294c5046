"""
Cross-validate ops.registration.ecc_align against OpenCV findTransformECC.

The reference's jitter accuracy comes from ``cv2.findTransformECC``
(reference image_motion.py:236); SURVEY hard-part #4 sets sub-0.01 px
agreement as the bar. This tool runs both solvers on the same corpus of
preprocessed synthetic star fields (translations / euclidian / affine,
noiseless and noisy) and reports:

- max |Δ| between the two solvers' warp-matrix entries per case, and
- the shared ECC objective evaluated at both solutions (both solvers
  maximise the same correlation; equal objectives mean any remaining
  parameter delta is indeterminacy of the objective under noise, not
  solver error).

Usage::

    python tools/validate_ecc.py

Measured bound (this image, cv2 5.0.0, CPU): noiseless max |Δ| 5.3e-3 px
across all modes; noisy translation/euclidian ≤ 7e-3 px; noisy affine
translation entries ≤ 0.03 px with |Δobjective| ≤ 5e-5 (objective-flat).
Enforced by tests/test_imagemotion.py::test_ecc_matches_opencv.

Note both solvers share a ~0.01-0.02 px *truth* bias on undersampled
(sigma≈1.5 px) star fields — inherent to the log+Scharr preprocessing and
bilinear warping of the ECC formulation itself, and identical in the
reference pipeline. Cross-validation, not truth recovery, is the parity
criterion here.
"""

from __future__ import annotations

import sys

import numpy as np

try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from photometry_tpu.ops.registration import (  # noqa: E402
    ecc_align, prepare_flux, warp_params_to_matrix)


def starfield(H=64, W=64, shift=(0.0, 0.0), theta=0.0, noise=0.0,
              seed=3, nstars=12, noise_seed=None):
    """Gaussian star field with a rigid shift/rotation applied to the
    star positions (not a resampled image — positions move exactly)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.full((H, W), 100.0)
    pos = rng.uniform(8, H - 8, (nstars, 2))
    cy, cx = H / 2, W / 2
    c, s = np.cos(theta), np.sin(theta)
    for r0, c0 in pos:
        x0, y0 = c0 - cx, r0 - cy
        cc = cx + c * x0 - s * y0 + shift[0]
        rr = cy + s * x0 + c * y0 + shift[1]
        img += 5000 * np.exp(-0.5 * ((yy - rr) ** 2 + (xx - cc) ** 2) / 1.5 ** 2)
    if noise:
        nrng = np.random.default_rng(seed if noise_seed is None else noise_seed)
        img += nrng.normal(0, noise, img.shape)
    return img.astype(np.float32)


def ecc_objective(ref, img, M):
    """The shared ECC correlation at warp M (ecc_align's exact geometry:
    bilinear sampling, out-of-bounds warped pixels excluded from the
    support — the same semantics as OpenCV's warped input mask — plus the
    static 2-px frame trim)."""
    H, W = ref.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    wx = M[0, 0] * xx + M[0, 1] * yy + M[0, 2]
    wy = M[1, 0] * xx + M[1, 1] * yy + M[1, 2]
    inb = (wx >= 0) & (wx <= W - 1.001) & (wy >= 0) & (wy <= H - 1.001)
    wx = np.clip(wx, 0, W - 1.001)
    wy = np.clip(wy, 0, H - 1.001)
    x0 = np.floor(wx).astype(int)
    y0 = np.floor(wy).astype(int)
    tx, ty = wx - x0, wy - y0
    w = (img[y0, x0] * (1 - tx) * (1 - ty) + img[y0, x0 + 1] * tx * (1 - ty)
         + img[y0 + 1, x0] * (1 - tx) * ty + img[y0 + 1, x0 + 1] * tx * ty)
    valid = np.ones((H, W))
    valid[:2] = 0
    valid[-2:] = 0
    valid[:, :2] = 0
    valid[:, -2:] = 0
    valid *= inb

    def norm(v):
        n = valid.sum()
        m = (v * valid).sum() / n
        v0 = (v - m) * valid
        return v0 / np.sqrt((v0 * v0).sum())

    return float((norm(np.asarray(ref, np.float64))
                  * norm(np.asarray(w, np.float64))).sum())


def cv2_ecc(ref, img, mode, eps=1e-10, max_iters=20000):
    """OpenCV solution on the SAME preprocessed inputs (gaussFiltSize=1 so
    neither solver blurs — apples to apples; the reference passes 5, which
    blurs inside cv2 and would compare different objectives)."""
    import cv2
    wm = {"translation": cv2.MOTION_TRANSLATION,
          "euclidian": cv2.MOTION_EUCLIDEAN,
          "affine": cv2.MOTION_AFFINE}[mode]
    warp = np.eye(2, 3, dtype=np.float32)
    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, max_iters, eps)
    cc, warp = cv2.findTransformECC(ref, img, warp, wm, crit,
                                    np.ones(img.shape, np.uint8), 1)
    return np.asarray(warp, np.float64), float(cc)


# (dx, dy, theta, noise_sigma); noise is drawn independently in ref and img.
CASES = [
    (0.8, -0.5, 0.0, 0.0),
    (0.31, 0.47, 0.004, 0.0),
    (-2.0, 0.3, 0.002, 0.0),
    (1.6, 2.2, 0.0, 2.0),
    (1.0, -0.7, 0.01, 2.0),
    (-2.0, 0.3, 0.0, 5.0),
]


def run_corpus(modes=("translation", "euclidian", "affine"), n_iters=150,
               verbose=True):
    """Returns list of dict rows; one per (mode, case)."""
    import jax.numpy as jnp
    rows = []
    for mode in modes:
        for i, (dx, dy, th, noise) in enumerate(CASES):
            if mode == "translation":
                th = 0.0
            ref = starfield(seed=3 + i, noise=noise, noise_seed=100 + i)
            img = starfield(shift=(dx, dy), theta=th, seed=3 + i,
                            noise=noise, noise_seed=200 + i)
            pref = np.asarray(prepare_flux(ref))
            pimg = np.asarray(prepare_flux(img))
            p, _cc = ecc_align(pref, pimg, mode=mode, n_iters=n_iters)
            Mo = np.asarray(warp_params_to_matrix(jnp.asarray(p), mode),
                            np.float64)
            Mc, _ccc = cv2_ecc(pref, pimg, mode)
            fo = ecc_objective(pref, pimg, Mo)
            fc = ecc_objective(pref, pimg, Mc)
            row = dict(mode=mode, case=i, noise=noise,
                       max_delta=float(np.abs(Mo - Mc).max()),
                       delta_translation=float(
                           np.abs(Mo[:, 2] - Mc[:, 2]).max()),
                       obj_ours=fo, obj_cv2=fc, obj_delta=fo - fc)
            rows.append(row)
            if verbose:
                print(f"{mode:12s} case{i} noise={noise:>4}: "
                      f"max|dM|={row['max_delta']:.3e} "
                      f"|d t|={row['delta_translation']:.3e} "
                      f"obj {fo:.6f} vs {fc:.6f} ({row['obj_delta']:+.1e})")
    return rows


def main():
    try:
        import cv2  # noqa: F401
    except ImportError:
        print("cv2 not available — cannot cross-validate")
        return 1
    rows = run_corpus()
    noiseless = [r for r in rows if r["noise"] == 0]
    noisy = [r for r in rows if r["noise"] > 0]
    print()
    print("noiseless corpus: max |dM| = %.3e  (bar: < 0.01)"
          % max(r["max_delta"] for r in noiseless))
    print("noisy corpus:     max |dt| = %.3e, max |d obj| = %.1e"
          % (max(r["delta_translation"] for r in noisy),
             max(abs(r["obj_delta"]) for r in noisy)))
    ok = (max(r["max_delta"] for r in noiseless) < 0.01
          and max(abs(r["obj_delta"]) for r in noisy) < 1e-4)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
