#!/usr/bin/env python3
"""End-to-end pipeline fuzzer: random sector configs -> full pipeline ->
photometric invariants against the simulator's injected truth.

Round 2's fuzzing found a real photometric bug (the KDE-mode threshold
freezing below all data on clean stamps -> NaN cuts -> 2x2 fallback masks),
so this harness generalises that campaign to the WHOLE pipeline: for each
iteration it draws a random :class:`photometry_tpu.sim.SimConfig`, runs
sim -> prepare -> todo -> photometry --all in-process (jit caches persist
across iterations; shapes are drawn from a small set so programs are
reused), and checks invariants:

  I1  every CLI stage exits 0;
  I2  the queue drains (no NULL statuses) and >=90% of tasks end
      OK/WARNING/SKIPPED;
  I3  every diagnostics row of an OK/WARNING target has finite mean_flux,
      contamination in [0, 1.5] or NaN, and mask_size >= 4;
  I4  every written light curve parses, TIME is strictly increasing, and
      FLUX_RAW is finite on >= half the good cadences;
  I5  (truth) for ISOLATED unsaturated targets (nearest neighbour either
      >= 12 px away or >= 3 mag fainter at >= 6 px, 8 <= tmag <= 12.5,
      >= 12 px from the frame edge) the diagnostics mean_flux matches the
      injected mean flux within 25% (violation at 50% — a gross
      photometric error like the round-2 fallback-mask bug).

Violations are printed as one JSON line each, with the full config for
reproduction, and collected into --out (default fuzz_report.json).

Usage:  python tools/fuzz_e2e.py --iters 50 [--seed0 0] [--out report.json]

Counterpart of nothing in the reference (tests there use fixed bundled
data); this is the sim-based substitute enabled by sim/simulator.py.
"""

import argparse
import json
import os
import shutil
import sqlite3
import sys
import tempfile
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from photometry_tpu.sim.simulator import SimConfig, simulate_sector  # noqa: E402
from photometry_tpu.core.status import STATUS  # noqa: E402


def draw_config(rng: np.random.Generator, it: int) -> SimConfig:
    """Random-but-plausible sector config.  Shapes come from a small set so
    XLA programs are reused across iterations (1-core host)."""
    side = int(rng.choice([96, 128]))
    lo = float(rng.uniform(4.0, 9.0))
    hi = float(rng.uniform(11.5, 14.0))
    return SimConfig(
        shape=(side, side),
        n_times=int(rng.integers(6, 28)),
        n_stars=int(rng.integers(8, 50)),
        tmag_range=(lo, max(hi, lo + 2.0)),
        bkg_level=float(rng.uniform(30.0, 300.0)),
        bkg_gradient=(float(rng.uniform(-0.3, 0.3)),
                      float(rng.uniform(-0.3, 0.3))),
        glow_amp=float(rng.uniform(0.0, 120.0)),
        glow_scale=float(rng.uniform(0.2, 0.5)),
        psf_sigma=float(rng.uniform(0.85, 1.6)),
        jitter_amp=float(rng.uniform(0.0, 0.25)),
        read_noise=float(rng.uniform(5.0, 15.0)),
        variable_fraction=float(rng.uniform(0.0, 0.5)),
        variable_amp=float(rng.uniform(0.0, 0.08)),
        seed=1000 + it,
    )


def isolated_targets(sim) -> dict:
    """starid -> True for targets where I5's flux-parity bound applies."""
    H, W = sim.config.shape
    r, c, tm = sim.row_ref, sim.col_ref, sim.tmag
    n = len(tm)
    out = {}
    for i in range(n):
        if not (8.0 <= tm[i] <= 12.5):
            continue
        if not (12 <= r[i] <= H - 13 and 12 <= c[i] <= W - 13):
            continue
        ok = True
        for j in range(n):
            if j == i:
                continue
            d = np.hypot(r[j] - r[i], c[j] - c[i])
            if d < 6.0:
                ok = False          # blended: aperture may merge/split
            elif d < 12.0 and tm[j] < tm[i] + 3.0:
                ok = False          # bright-ish neighbour inside the stamp
            if not ok:
                break
        if ok:
            out[int(sim.starid[i])] = True
    return out


def run_one(it: int, cfg: SimConfig, keep: bool = False):
    """Run the full pipeline for one config; return a list of violations."""
    from photometry_tpu.cli import prepare_cmd, todo_cmd, photometry_cmd
    from photometry_tpu.io import fits as pf

    violations = []

    def viol(kind, **detail):
        violations.append({"iter": it, "kind": kind,
                           "config": {k: (list(v) if isinstance(v, tuple) else v)
                                      for k, v in vars(cfg).items()},
                           **detail})

    d = tempfile.mkdtemp(prefix="fuzz_e2e_")
    try:
        sim = simulate_sector(cfg)
        sim.write_ffis(d)
        sim.write_catalog(d)
        # ~half the iterations also exercise the TPF datasource (primary +
        # possible secondaries, separate cadence tree, quality transfer):
        rng_t = np.random.default_rng(cfg.seed + 31)
        if rng_t.uniform() < 0.5:
            side = int(rng_t.choice([11, 13, 17]))
            for sid in sim.starid[:int(rng_t.integers(1, 3))]:
                sim.write_tpf(d, int(sid), stamp=(side, side),
                              n_times=int(rng_t.integers(20, 60)))
        for name, main, argv in (
                ("prepare", prepare_cmd.main, ["-q", d]),
                ("todo", todo_cmd.main, ["-q", d]),
                ("photometry", photometry_cmd.main,
                 ["-q", "--all", "--version", "1", d])):
            rc = main(argv)
            if rc != 0:
                viol("I1_cli_exit", stage=name, rc=rc)
                return violations, {}

        with sqlite3.connect(os.path.join(d, "todo.sqlite")) as conn:
            conn.row_factory = sqlite3.Row
            rows = conn.execute(
                "SELECT t.priority, t.starid, t.status, t.tmag, t.datasource, "
                "d.mean_flux, d.contamination, d.mask_size, d.lightcurve, "
                "d.method_used, d.errors FROM todolist t "
                "LEFT JOIN diagnostics d ON d.priority = t.priority;"
            ).fetchall()

        n_null = sum(1 for r in rows if r["status"] is None)
        good = {STATUS.OK.value, STATUS.WARNING.value, STATUS.SKIPPED.value}
        n_good = sum(1 for r in rows if r["status"] in good)
        # ERRORs the reference produces on the same inputs are not pipeline
        # bugs: 'Too many stamp resizes.' fires when the K2P2 cut lands
        # below a background-fit edge residual and the mask keeps touching
        # the stamp edge (photometry.py:147-163 semantics; on 96-160 px sim
        # frames the 64-px background tiles leave ~3-5 e-/s edge ridges that
        # production 2048^2 CCDs don't).  Verified case: fuzz seed 101025 —
        # CUT=2.4 vs a +4 e-/s top-edge residual, identical above-cut blob
        # under the reference threshold composition.
        _REF_FAITHFUL = {"Too many stamp resizes."}
        n_ref_faithful = sum(
            1 for r in rows
            if r["status"] == STATUS.ERROR.value and r["errors"]
            and set(filter(None, str(r["errors"]).split("\n"))) <= _REF_FAITHFUL)
        if n_ref_faithful:
            viol("I2_ref_faithful_errors", count=n_ref_faithful,
                 total=len(rows))
        if n_null:
            viol("I2_queue_not_drained", n_null=n_null, total=len(rows))
        if n_good + n_ref_faithful < 0.9 * len(rows):
            viol("I2_too_many_failures", n_good=n_good, total=len(rows),
                 statuses={str(r["status"]): sum(1 for q in rows
                                                 if q["status"] == r["status"])
                           for r in rows})

        iso = isolated_targets(sim)
        truth = dict(zip(sim.starid.tolist(), sim.mean_flux_true.tolist()))
        checked = 0
        for r in rows:
            if r["status"] not in (STATUS.OK.value, STATUS.WARNING.value):
                continue
            mf = r["mean_flux"]
            if mf is None or not np.isfinite(mf):
                viol("I3_bad_mean_flux", starid=r["starid"], mean_flux=mf)
                continue
            cont = r["contamination"]
            if cont is not None and np.isfinite(cont) and not (-1e-6 <= cont <= 1.5):
                viol("I3_bad_contamination", starid=r["starid"],
                     contamination=cont)
            if (r["mask_size"] is not None and r["mask_size"] < 4
                    and r["status"] == STATUS.OK.value):
                # WARNING rows may carry a <4-px mask legitimately: the
                # reference's 2x2 minimum-aperture fallback intersected
                # with collected pixels (verified on a TPF secondary at
                # the stamp edge, campaign B iter 25).
                viol("I3_tiny_mask", starid=r["starid"],
                     mask_size=r["mask_size"])
            if r["status"] == STATUS.OK.value and r["starid"] in iso \
                    and r["method_used"] == "aperture" \
                    and r["datasource"] == "ffi":
                # (TPF rows run a different time axis than the FFI truth
                # table; their structural checks I3/I4 still apply.)
                t = truth.get(r["starid"])
                if t and t > 0:
                    ratio = mf / t
                    checked += 1
                    if not (0.5 <= ratio <= 2.0):
                        viol("I5_flux_gross_error", starid=r["starid"],
                             ratio=round(ratio, 4), tmag=r["tmag"])
                    elif not (0.75 <= ratio <= 1.25):
                        viol("I5_flux_warn", starid=r["starid"],
                             ratio=round(ratio, 4), tmag=r["tmag"])

        # I4: parse every light curve of this run
        n_lc = 0
        for r in rows:
            if not r["lightcurve"]:
                continue
            p = os.path.join(d, r["lightcurve"])
            if not os.path.exists(p):
                viol("I4_missing_file", starid=r["starid"], path=r["lightcurve"])
                continue
            try:
                hdus = pf.read_fits(p)
            except Exception as exc:
                viol("I4_unreadable", starid=r["starid"], error=repr(exc))
                continue
            names = [h.name for h in hdus]
            lc = hdus[names.index("LIGHTCURVE")]
            t = np.asarray(lc.data["TIME"], float)
            if not np.all(np.diff(t) > 0):
                viol("I4_time_not_increasing", starid=r["starid"])
            fr = np.asarray(lc.data["FLUX_RAW"], float)
            q = np.asarray(lc.data["QUALITY"], int)
            goodcad = q == 0
            if goodcad.sum() and np.isfinite(fr[goodcad]).sum() < 0.5 * goodcad.sum():
                viol("I4_flux_mostly_nan", starid=r["starid"],
                     finite=int(np.isfinite(fr[goodcad]).sum()),
                     good=int(goodcad.sum()))
            n_lc += 1
        return violations, {"n_tasks": len(rows), "n_good": n_good,
                            "n_lc": n_lc, "n_truth_checked": checked}
    except Exception:
        viol("crash", traceback=traceback.format_exc())
        return violations, {}
    finally:
        if not keep:
            shutil.rmtree(d, ignore_errors=True)
        else:
            print(f"# kept {d}", file=sys.stderr)


def _bound_maps():
    """conftest's map-count guard (vm.max_map_count SIGSEGV, CLAUDE.md)."""
    try:
        with open("/proc/self/maps") as fh:
            n = sum(1 for _ in fh)
    except OSError:
        return
    if n > 30_000:
        jax.clear_caches()
        from photometry_tpu.utils import aot
        aot.clear()


#: Reported but not counted as pipeline bugs.
_SOFT_KINDS = {"I5_flux_warn", "I2_ref_faithful_errors"}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--seed0", type=int, default=0)
    ap.add_argument("--out", default="fuzz_report.json")
    ap.add_argument("--keep-failures", action="store_true",
                    help="keep the tmp dir of iterations with violations")
    args = ap.parse_args(argv)

    import logging
    logging.getLogger("photometry_tpu").setLevel(logging.ERROR)

    rng = np.random.default_rng(args.seed0)
    all_viol, summary = [], []
    t_start = time.time()
    for it in range(args.iters):
        cfg = draw_config(rng, args.seed0 * 100000 + it)
        t0 = time.time()
        viol, stats = run_one(it, cfg, keep=args.keep_failures)
        hard = [v for v in viol if v["kind"] not in _SOFT_KINDS]
        for v in viol:
            print(json.dumps(v))
        line = {"iter": it, "seed": cfg.seed, "shape": cfg.shape[0],
                "T": cfg.n_times, "stars": cfg.n_stars,
                "violations": len(hard), "warns": len(viol) - len(hard),
                "wall_s": round(time.time() - t0, 1), **stats}
        print(json.dumps({"progress": line}), file=sys.stderr, flush=True)
        summary.append(line)
        all_viol.extend(viol)
        _bound_maps()

    report = {
        "iters": args.iters,
        "seed0": args.seed0,
        "wall_s": round(time.time() - t_start, 1),
        "hard_violations": sum(1 for v in all_viol
                               if v["kind"] not in _SOFT_KINDS),
        "warns": sum(1 for v in all_viol if v["kind"] in _SOFT_KINDS),
        "violations": all_viol,
        "summary": summary,
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("iters", "hard_violations", "warns", "wall_s")}))
    return 1 if report["hard_violations"] else 0


if __name__ == "__main__":
    sys.exit(main())
