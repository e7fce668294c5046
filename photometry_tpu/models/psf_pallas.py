"""
Fused warm-start LM PSF fit — one Pallas TPU kernel per 128 cadences.

The phase-2 PSF fit (models/psf_fit._fit_psf_timeseries_impl: every cadence
re-fit from the first-frame solution) is small-tensor work: per (target,
cadence) instance an S-star table-PRF render (13x13-ish), a 3S x 3S normal
equation, and a tiny Cholesky solve, iterated ~6 times.  As XLA ops these
are hundreds of (N*T)-sized elementwise passes plus MXU-padded micro-
matmuls — profiled round 4 at ~31 ms/LM-iteration + 87 ms fixed for a
96-target x 1312-cadence chunk (~390 targets/s), with the batched 12x12
Cholesky solve alone at 16 ms and the covariance inverse at 22 ms, both
~100x off their HBM-traffic floor (vector-op issue overhead).

This kernel keeps EVERYTHING per instance in VMEM: the Catmull-Rom
separable table render (the same one-hot formulation as
models/prf._axis_values, against the same phase-folded tables), the
weighted normal equations, the unrolled Cholesky solve, the damped-GN
parameter update with the reference's flux/position clips, all ``n_iters``
iterations in a ``fori_loop``, then the final render for the flux
covariance (Cholesky-inverse column norms) and the MOMF residual-aperture
sum (reference psf_photometry.py:168-171).  HBM traffic per instance is
one stamp read + a few hundred bytes of parameters — ~200x less than the
XLA formulation materialises.

Layout: instances on the 128 lanes (grid over B/128 blocks); pixels
FLATTENED onto one (h*w_pad) sublane axis so every pixel tensor is 2-D and
every normal-equation entry is one multiply + one single-axis reduction;
the folded PRF tables ride along replicated (tens of KB).  Mosaic
constraints honoured per CLAUDE.md: blocks keep sublane%8 / lane
%128-or-full, reductions are single-axis, iota is integer, dot_general
uses one contracting dimension.

Scope (the production table-PRF path): grid-separable PRFs with K <= 4
SVD terms, Gaussian_d likelihood, single device.  models/psf_fit falls
back to the vmapped XLA fitter otherwise; both paths implement the same
math (asserted against each other in tests/test_psf_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..ops.spline import _CRM

__all__ = ["fused_warm_fit", "fused_ok"]

#: Catmull-Rom basis matrix as HOST numpy: the kernel bakes its entries in
#: as python floats (a closed-over jnp array would be captured as a traced
#: constant inside the pallas trace).
_CRM_NP = np.asarray(_CRM)

LANES = 128
W_PAD = 8       # stamp width padded to a multiple of this (sublane tiling)
KMAX = 4        # unrolled SVD terms; larger tables use the XLA path
LM_LAMBDA = 1e-3


def fused_ok(prf, shape, S: int, lhood_stat: str) -> bool:
    """Can this configuration run the fused kernel?"""
    if lhood_stat != "Gaussian_d" or S > 8:
        return False
    if not prf._grid_separable:
        return False
    U, V = prf._svd_factors()
    if U.shape[1] > KMAX:
        return False
    h, w = shape
    return h <= 32 and w <= 32


def _kernel(img_ref, wmap_ref, miniw_ref, p0_ref, valid_ref, onehot_ref,
            f4u_ref, f4v_ref, params_ref, extra_ref, *,
            h, w, wp, S, K, os_, b_lo_u, b_hi_u, L0u, cy,
            b_lo_v, b_hi_v, L0v, cx, Lmu, Lmv, n_iters, cutoff):
    """One block = 128 (target, cadence) instances; pixels flat on sublanes."""
    P3 = 3 * S
    fos = 4 * os_
    HWP = h * wp

    img = img_ref[...]                      # (HWP, 128) nan_to_num'ed
    wmap = wmap_ref[...]                    # (HWP, 128) weights (0 invalid)
    valid = [valid_ref[s:s + 1] for s in range(S)]    # (1, 128) f32 each
    pv = valid + valid + valid                        # per-parameter mask

    def axis_eval(coord, f4_ref, b_lo, b_hi, L0, center, npix, Lm):
        """coord (1, 128) -> (vals, dvals): K lists of (npix, 128) arrays."""
        y0 = (0.0 - coord) * float(os_) + float(center)
        fl = jnp.floor(y0)
        t = y0 - fl
        b = fl.astype(jnp.int32) - 1
        idx = jnp.clip(b, b_lo, b_hi) - b_lo
        m0 = idx // os_
        r0 = idx - m0 * os_
        tp = [jnp.ones_like(t), t, t * t, t * t * t]
        dtp = [jnp.zeros_like(t), jnp.ones_like(t), 2.0 * t, 3.0 * t * t]
        wb = [sum(tp[p] * float(_CRM_NP[p, j]) for p in range(4))
              for j in range(4)]
        dwb = [sum(dtp[p] * float(_CRM_NP[p, j]) for p in range(4))
               for j in range(4)]
        rr = jax.lax.broadcasted_iota(jnp.int32, (fos, LANES), 0)
        W4 = jnp.zeros((fos, LANES), jnp.float32)
        dW4 = jnp.zeros((fos, LANES), jnp.float32)
        for j in range(4):
            sel = rr == (j * os_ + r0)
            W4 = W4 + jnp.where(sel, wb[j], 0.0)
            dW4 = dW4 + jnp.where(sel, dwb[j], 0.0)
        # one-hot of the base fold row; vals[i] = sum_m OH0[m] Bw[m + i]
        # (a per-lane band selection as STATIC slices of a padded Bw):
        mI = jax.lax.broadcasted_iota(jnp.int32, (Lm, LANES), 0)
        OH0 = (mI == m0).astype(jnp.float32)
        # per-pixel domain validity as ONE (npix, 128) factor:
        yv = y0 + jax.lax.broadcasted_iota(          # Mosaic: iota must be
            jnp.int32, (npix, LANES), 0).astype(jnp.float32) * float(os_)
        vf = jnp.where((yv >= 0.0) & (yv <= float(L0 - 1)), 1.0, 0.0)
        dims = (((1,), (0,)), ((), ()))
        zpad = jnp.zeros((npix, LANES), jnp.float32)
        us, dus = [], []
        for k in range(K):
            f4k = f4_ref[k]                            # (Lm, 4os)
            # HIGHEST: the TPU default lowers f32 dots to one bf16 MXU
            # pass — ~1e-2 relative error in the table values, which the
            # iterated GN steps amplify on near-degenerate blends.
            Bw = jax.lax.dot_general(f4k, W4, dims,
                                     precision=jax.lax.Precision.HIGHEST,
                                     preferred_element_type=jnp.float32)
            dBw = jax.lax.dot_general(f4k, dW4, dims,
                                      precision=jax.lax.Precision.HIGHEST,
                                      preferred_element_type=jnp.float32)
            BwP = jnp.concatenate([Bw, zpad], axis=0)
            dBwP = jnp.concatenate([dBw, zpad], axis=0)
            # All npix band selections in one multiply + one single-axis
            # reduce over a stacked (npix, Lm, 128) window tensor (the
            # per-row loop issued 2*npix vector ops per k — vector-issue
            # overhead was the kernel's bound, measured flat in the chunk
            # size r4):
            win_u = jnp.stack([BwP[i:i + Lm] for i in range(npix)], axis=0)
            win_du = jnp.stack([dBwP[i:i + Lm] for i in range(npix)], axis=0)
            u_k = jnp.sum(win_u * OH0[None], axis=1) * vf
            du_k = jnp.sum(win_du * OH0[None], axis=1) * (vf * float(-os_))
            us.append(u_k)
            dus.append(du_k)
        return us, dus

    # static pixel-grid coordinates of the flattened (h, wp) stamp:
    pix = jax.lax.broadcasted_iota(jnp.int32, (HWP, LANES), 0)
    pix_a = (pix // wp).astype(jnp.float32)
    pix_b = (pix - (pix // wp) * wp).astype(jnp.float32)
    colpad = (pix_b < float(w)).astype(jnp.float32)

    def render(p):
        """q/qr/qc per star at parameters p (3S rows of (1,128))."""
        qs, qrs, qcs = [], [], []
        zrow = jnp.zeros((wp - w, LANES), jnp.float32)
        for s in range(S):
            r_s = p[s]
            c_s = p[S + s]
            us, dus = axis_eval(r_s, f4u_ref, b_lo_u, b_hi_u, L0u, cy, h, Lmu)
            vs, dvs = axis_eval(c_s, f4v_ref, b_lo_v, b_hi_v, L0v, cx, w, Lmv)
            q = qr = qc = None
            for k in range(K):
                v_full = jnp.concatenate([vs[k], zrow], axis=0)     # (wp, L)
                dv_full = jnp.concatenate([dvs[k], zrow], axis=0)
                # Separable outer product as ONE broadcast multiply on a
                # (h, wp, 128) tensor; wp % 8 == 0 makes the reshape to
                # (HWP, 128) a pure sublane merge (no relayout) — the
                # per-row formulation issued 3*h vector multiplies + 3
                # concats per (star, k):
                u3 = us[k][:, None, :]                              # (h,1,L)
                du3 = dus[k][:, None, :]
                qk = (u3 * v_full[None]).reshape(HWP, LANES)
                qrk = (du3 * v_full[None]).reshape(HWP, LANES)
                qck = (u3 * dv_full[None]).reshape(HWP, LANES)
                q = qk if q is None else q + qk
                qr = qrk if qr is None else qr + qrk
                qc = qck if qc is None else qc + qck
            dr = pix_a - r_s
            dc = pix_b - c_s
            cut = ((dr * dr + dc * dc < float(cutoff) ** 2)
                   .astype(jnp.float32) * colpad)
            qs.append(q * cut)
            qrs.append(qr * cut)
            qcs.append(qc * cut)
        return qs, qrs, qcs

    def sum_pix(x):
        return jnp.sum(x, axis=0, keepdims=True)       # (HWP, L) -> (1, L)

    def normal_eq(p, qs, qrs, qcs):
        """(JtJ dict, Jtg list, mdl, diff) with dummy-star rows frozen."""
        mdl = None
        for s in range(S):
            fs = p[2 * S + s]
            mdl = qs[s] * fs if mdl is None else mdl + qs[s] * fs
        diff = img - mdl
        A = ([qrs[s] * p[2 * S + s] for s in range(S)]
             + [qcs[s] * p[2 * S + s] for s in range(S)] + qs)
        JtJ = {}
        Jtg = []
        for i in range(P3):
            Awi = A[i] * wmap
            for j in range(i + 1):
                JtJ[(i, j)] = sum_pix(Awi * A[j]) * pv[i] * pv[j]
            Jtg.append(sum_pix(Awi * diff) * pv[i])
        return JtJ, Jtg, mdl, diff

    def chol(JtJ, damp: bool):
        L = {}
        for j in range(P3):
            a_jj = JtJ[(j, j)]
            if damp:
                a_jj = a_jj * (1.0 + LM_LAMBDA) + 1e-8
            d = a_jj - sum(L[(j, k)] * L[(j, k)] for k in range(j))
            Ljj = jnp.sqrt(jnp.maximum(d, 1e-30))
            L[(j, j)] = Ljj
            inv = 1.0 / Ljj
            for i in range(j + 1, P3):
                a_ij = JtJ[(i, j)]
                s_ = a_ij - sum(L[(i, k)] * L[(j, k)] for k in range(j))
                L[(i, j)] = s_ * inv
        return L

    def cho_solve(L, b):
        y = []
        for i in range(P3):
            s_ = b[i] - sum(L[(i, k)] * y[k] for k in range(i))
            y.append(s_ / L[(i, i)])
        x = [None] * P3
        for i in reversed(range(P3)):
            s_ = y[i] - sum(L[(k, i)] * x[k] for k in range(i + 1, P3))
            x[i] = s_ / L[(i, i)]
        return x

    def step(_, parr):
        p = [parr[i:i + 1] for i in range(P3)]          # (1, 128) rows
        qs, qrs, qcs = render(p)
        JtJ, Jtg, _, _ = normal_eq(p, qs, qrs, qcs)
        L = chol(JtJ, damp=True)
        dp = cho_solve(L, Jtg)
        newp = []
        for s in range(S):                              # rows: clip valid only
            r_new = p[s] + dp[s] * pv[s]
            newp.append(jnp.where(valid[s] > 0,
                                  jnp.clip(r_new, -2.0, float(h + 1)), r_new))
        for s in range(S):
            c_new = p[S + s] + dp[S + s] * pv[S + s]
            newp.append(jnp.where(valid[s] > 0,
                                  jnp.clip(c_new, -2.0, float(w + 1)), c_new))
        for s in range(S):                              # fluxes >= 0
            newp.append(jnp.maximum(p[2 * S + s] + dp[2 * S + s] * pv[s], 0.0))
        return jnp.concatenate(newp, axis=0)            # (3S, 128)

    p0 = jnp.concatenate([p0_ref[i:i + 1] for i in range(P3)], axis=0)
    pfin = jax.lax.fori_loop(0, n_iters, step, p0)
    p = [pfin[i:i + 1] for i in range(P3)]

    # --- final covariance + MOMF correction --------------------------------
    qs, qrs, qcs = render(p)
    JtJ, _, mdl, diff = normal_eq(p, qs, qrs, qcs)
    dmax = JtJ[(0, 0)]
    for i in range(1, P3):
        dmax = jnp.maximum(dmax, JtJ[(i, i)])
    ridge = 1e-6 * jnp.maximum(dmax, 1.0)
    JtJr = dict(JtJ)
    for i in range(P3):
        JtJr[(i, i)] = JtJ[(i, i)] + ridge
    L = chol(JtJr, damp=False)
    # diag(A^-1)[kk] = sum_i (L^-1)[i, kk]^2 for the S flux rows:
    fluxvar_t = jnp.zeros((1, LANES), jnp.float32)
    for s in range(S):
        kk = 2 * S + s
        x = {}
        for i in range(kk, P3):
            e_i = 1.0 if i == kk else 0.0
            s_ = e_i - sum(L[(i, k)] * x[k] for k in range(kk, i))
            x[i] = s_ / L[(i, i)]
        var_s = sum(x[i] * x[i] for i in range(kk, P3))
        fluxvar_t = fluxvar_t + var_s * onehot_ref[s:s + 1]
    flux_ap = sum_pix(miniw_ref[...] * diff)

    pad_rows = params_ref.shape[0] - P3
    params_ref[...] = jnp.concatenate(
        p + ([jnp.zeros((pad_rows, LANES), jnp.float32)] if pad_rows else []),
        axis=0)
    extra_ref[...] = jnp.concatenate(
        [flux_ap, fluxvar_t, jnp.zeros((6, LANES), jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=("prf", "shape", "S", "n_iters"))
def fused_warm_fit(images, backgrounds, var_const, p0, valid, miniw, onehot,
                   prf, shape, S: int, n_iters: int):
    """Warm-start LM fit of B independent stamps in one fused kernel.

    images/backgrounds: (B, h, w); p0: (B, 3S); valid: (B, S) bool;
    miniw: (B, h, w) bool (MOMF aperture mask — ANDed with finite pixels
    here); onehot: (B, S) f32 selecting each instance's main target.

    Returns dict with params (B, 3S), flux_ap (B,), fluxvar_target (B,).
    Gaussian_d weights only (they are data-constant, computed here once).
    """
    B, h, w = images.shape
    wp = ((w + W_PAD - 1) // W_PAD) * W_PAD
    HWP = h * wp
    U, V = prf._svd_factors()
    K = U.shape[1]
    os_ = int(round(prf.oversample))
    b_lo_u, b_hi_u, Lmu0, F4u = prf._axis_folded_table(U, h)
    b_lo_v, b_hi_v, Lmv0, F4v = prf._axis_folded_table(V, w)

    def fold_input(F4, Lm0):
        # (4os, Lm*K) -> (K, Lm_pad, 4os), zero-padded fold rows:
        fos = 4 * os_
        t = np.asarray(F4, np.float32).reshape(fos, Lm0, K)
        Lm = ((Lm0 + 7) // 8) * 8
        out = np.zeros((K, Lm, fos), np.float32)
        out[:, :Lm0] = t.transpose(2, 1, 0)
        return out, Lm

    F4u_t, Lmu = fold_input(F4u, Lmu0)
    F4v_t, Lmv = fold_input(F4v, Lmv0)

    Bp = ((B + LANES - 1) // LANES) * LANES

    def to_lanes(a, pad_rows=None):
        """(B, R) -> (R_pad, Bp) with zero padding."""
        a = jnp.moveaxis(a, 0, -1)
        rpad = 0 if pad_rows is None else pad_rows - a.shape[0]
        return jnp.pad(a, ((0, rpad), (0, Bp - B)))

    good = jnp.isfinite(images)
    img0 = jnp.where(good, images, 0.0)
    wmap = jnp.where(good, 1.0 / jnp.maximum(
        jnp.abs(img0 + backgrounds) + var_const, 1e-9), 0.0)

    def flat_pix(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, wp - w))).reshape(B, HWP)

    # Parameter rows padded to a sublane multiple that holds all 3S rows
    # (S=6..8 passes fused_ok; a fixed 16 underflowed there — trace crash):
    RP = max(16, -(-3 * S // 8) * 8)
    img_in = to_lanes(flat_pix(img0))
    wmap_in = to_lanes(flat_pix(wmap.astype(jnp.float32)))
    miniw_in = to_lanes(flat_pix((miniw & good).astype(jnp.float32)))
    p0_in = to_lanes(p0.astype(jnp.float32), RP)
    valid_in = to_lanes(valid.astype(jnp.float32), 8)
    onehot_in = to_lanes(onehot.astype(jnp.float32), 8)

    kern = functools.partial(
        _kernel, h=h, w=w, wp=wp, S=S, K=K, os_=os_,
        b_lo_u=b_lo_u, b_hi_u=b_hi_u, L0u=U.shape[0], cy=prf.center_y,
        b_lo_v=b_lo_v, b_hi_v=b_hi_v, L0v=V.shape[0], cx=prf.center_x,
        Lmu=Lmu, Lmv=Lmv, n_iters=n_iters, cutoff=5.0)

    grid = (Bp // LANES,)
    pix_spec = pl.BlockSpec((HWP, LANES), lambda i: (0, i))
    row16 = pl.BlockSpec((RP, LANES), lambda i: (0, i))
    row8 = pl.BlockSpec((8, LANES), lambda i: (0, i))
    tbl_u = pl.BlockSpec((K, Lmu, 4 * os_), lambda i: (0, 0, 0))
    tbl_v = pl.BlockSpec((K, Lmv, 4 * os_), lambda i: (0, 0, 0))

    kwargs = {}
    if jax.default_backend() != "cpu":
        from jax.experimental.pallas import tpu as pltpu
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    params_t, extra_t = pl.pallas_call(
        kern, grid=grid,
        in_specs=[pix_spec, pix_spec, pix_spec, row16, row8, row8,
                  tbl_u, tbl_v],
        out_specs=[row16, row8],
        out_shape=[jax.ShapeDtypeStruct((RP, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((8, Bp), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
        **kwargs,
    )(img_in, wmap_in, miniw_in, p0_in, valid_in, onehot_in,
      jnp.asarray(F4u_t), jnp.asarray(F4v_t))

    params = params_t[:3 * S, :B].T
    return {"params": params,
            "flux_ap": extra_t[0, :B],
            "fluxvar_target": extra_t[1, :B]}
