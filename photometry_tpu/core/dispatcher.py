"""
Method dispatcher: run photometry for tasks, with automatic halo switching.

Behavioral counterpart of reference photometry/tessphot.py:52-135: the
default path runs aperture photometry, and bright targets whose mask leaks
flux off the stamp edge (or that exhausted their stamp resizes) are retried
with halo photometry; explicit methods map to {aperture, psf, linpsf, halo}.
All exceptions are converted to STATUS.ERROR results carrying the traceback
(tessphot.py:20-49).

TPU re-design: the dispatcher is *batch-first* — :func:`photometry_batch`
runs a whole compatible task batch through the batched aperture extractor,
then reruns the (few) halo-switch candidates; :func:`photometry_single`
keeps the reference's one-star call signature.
"""

from __future__ import annotations

import functools
import logging
import os
import traceback
from typing import Optional

import numpy as np

from ..io.settings import load_settings
from ..utils.logutils import capture_warnings
from ..utils.mathutils import mag2flux
from .engine import SectorContext, TpfContext, extract_aperture_batch, TargetResult
from .status import STATUS

logger = logging.getLogger(__name__)

__all__ = ["photometry_batch", "photometry_single", "open_context",
           "default_time_corrector", "ContextCache"]

_HALO_SWITCH_ERRORS = ("Too many stamp resizes.",
                       "Stamp resize hit limit. Haloswitch quick break.")


@functools.lru_cache(maxsize=1)
def default_time_corrector():
    """Shared TimeCorrector from the cached spacecraft ephemeris.

    Production FFI contexts recompute the barycentric correction per target
    position (reference BasePhotometry.py:443-453 via TESS_SPICE); the
    ephemeris comes from the download cache (URL-fetched or synthesized —
    download_cache.load_cached_ephemeris).  Returns None when disabled in
    settings ([timecorr] pertarget) or no ephemeris can be provisioned.
    """
    settings = load_settings()
    if not settings.getboolean("timecorr", "pertarget", fallback=True):
        return None
    try:
        from ..download_cache import load_cached_ephemeris
        from .timecorr import TimeCorrector
        return TimeCorrector(load_cached_ephemeris())
    except Exception:
        logger.warning("No spacecraft ephemeris available; light curves "
                       "will carry frame-level (mid-CCD) times", exc_info=True)
        return None


class ContextCache:
    """Reuse device-resident FFI contexts across task batches.

    A sector-CCD cube upload costs seconds; the TaskManager's tmag-sorted
    leases hand a worker many consecutive batches of the SAME (sector,
    camera, ccd), so callers that drain the queue should fetch contexts
    through this cache instead of open_context per batch.  TPF contexts
    are per-target and never cached.
    """

    def __init__(self, capacity: int = 1, mesh=None):
        self.capacity = max(capacity, 1)
        self.mesh = mesh
        self._items: "dict[tuple, object]" = {}

    def get(self, input_folder: str, task: dict):
        if task["datasource"] != "ffi":
            return open_context(input_folder, task), False
        key = (input_folder, int(task["sector"]), int(task["camera"]),
               int(task["ccd"]))
        ctx = self._items.pop(key, None)
        if ctx is None:
            ctx = open_context(input_folder, task, mesh=self.mesh)
            while len(self._items) >= self.capacity:
                # evict the LEAST recently used context (insertion order =
                # recency here, since hits re-insert) — dict.popitem()
                # would pop the MOST recent one:
                lru_key = next(iter(self._items))
                self._items.pop(lru_key).close()
        self._items[key] = ctx
        return ctx, True

    def close(self):
        for ctx in self._items.values():
            ctx.close()
        self._items.clear()

    def release(self, ctx, cached: bool):
        """Close a context that did not come from the cache."""
        if not cached:
            ctx.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_context(input_folder: str, task: dict, cache: str = "device",
                 mesh=None):
    """Create the right data context for a task dict.

    ``mesh`` (a parallel.mesh time x targets Mesh) uploads FFI cubes
    time-sharded across the mesh and routes extraction through the
    multi-chip shard_map tier; TPF contexts are single-target postage
    stamps and ignore it.
    """
    ds = task["datasource"]
    if ds == "ffi":
        return SectorContext(input_folder, int(task["sector"]),
                             int(task["camera"]), int(task["ccd"]), cache=cache,
                             time_corrector=default_time_corrector(),
                             mesh=mesh)
    if ds.startswith("tpf:"):
        return TpfContext(input_folder, int(ds[4:]), sector=int(task["sector"]),
                          cadence=int(task["cadence"]))
    return TpfContext(input_folder, int(task["starid"]), sector=int(task["sector"]),
                      cadence=int(task["cadence"]))


def _error_result(task, ctx, tb: str) -> TargetResult:
    return TargetResult(
        starid=int(task["starid"]), method="error", status=STATUS.ERROR,
        sector=int(task.get("sector") or 0), camera=int(task.get("camera") or 0),
        ccd=int(task.get("ccd") or 0), cadence=int(task.get("cadence") or 0),
        data_rel=getattr(ctx, "data_rel", 0) or 0, target={},
        lightcurve={}, details={"errors": [tb]})


def _run_method(ctx, starids, method: str, keep_diag: bool = False, **kw) -> list:
    if method == "aperture":
        return extract_aperture_batch(ctx, starids, **kw)
    if method == "halo":
        from ..models.halo import extract_halo_batch
        return extract_halo_batch(ctx, starids, **kw)
    if method == "psf":
        from ..models.psf_fit import extract_psf_batch
        return extract_psf_batch(ctx, starids, keep_diag=keep_diag, **kw)
    if method == "linpsf":
        from ..models.linpsf import extract_linpsf_batch
        return extract_linpsf_batch(ctx, starids, keep_diag=keep_diag, **kw)
    raise ValueError(f"Invalid method: '{method}'")


def _needs_halo_switch(res: TargetResult, tmag_limit: float, flux_limit: float) -> bool:
    """Reference tessphot.py:86-111 auto-switch condition."""
    if res.target.get("tmag", 99) > tmag_limit:
        return False
    errors = res.details.get("errors", []) or []
    if res.status == STATUS.ERROR and any(e in errors for e in _HALO_SWITCH_ERRORS):
        return True
    edge_flux = res.details.get("edge_flux")
    if edge_flux is not None and res.status in (STATUS.OK, STATUS.WARNING, STATUS.ERROR):
        expected = float(np.asarray(mag2flux(res.target["tmag"])))
        if edge_flux / expected > flux_limit:
            return True
    return False


def photometry_batch(ctx, tasks: list, output_folder: Optional[str] = None,
                     version: Optional[int] = None, save: bool = True,
                     plot_folder: Optional[str] = None) -> list:
    """Run photometry for a batch of compatible tasks on one context.

    Tasks without an explicit method run aperture photometry; bright targets
    matching the halo-switch condition are rerun with halo.  Exceptions per
    method-group degrade to STATUS.ERROR results rather than killing the
    batch.  When ``save``, light curves of OK/WARNING results are written.
    When ``plot_folder`` is given, per-target diagnostic figures are rendered
    into ``<plot_folder>/plots/<starid>/`` (reference BasePhotometry.py:394-397;
    see :mod:`photometry_tpu.diagnostics`).
    """
    settings = load_settings()
    tmag_limit = settings.getfloat("haloswitch", "tmag_limit", fallback=6.0)
    flux_limit = settings.getfloat("haloswitch", "flux_limit", fallback=0.01)

    by_method = {}
    for task in tasks:
        method = task.get("method") or "aperture"
        by_method.setdefault(method, []).append(task)

    # Fire background compiles for PSF-family groups before any group runs:
    # their ~7-8 s per-shape program compiles (models/psf_fit.py) then
    # overlap the aperture group's work instead of stalling the first PSF
    # batch.  The prefetch call itself is cheap host work (catalog setups +
    # submissions to the utils/aot thread pool, where the actual compiles
    # run in the background) and MUST stay on this thread: the context's
    # sqlite catalog connection is thread-bound, so a worker thread's
    # catalog query would raise and silently kill the whole prefetch.
    if len(by_method) > 1:
        def _safe_prefetch(fn, sids):
            try:
                fn(ctx, sids)
            except Exception:  # pragma: no cover - prefetch is best-effort
                logger.debug("PSF program prefetch failed", exc_info=True)

        if "psf" in by_method:
            from ..models.psf_fit import prefetch_psf_programs
            _safe_prefetch(prefetch_psf_programs,
                           [int(t["starid"]) for t in by_method["psf"]])
        if "linpsf" in by_method:
            from ..models.linpsf import prefetch_linpsf_programs
            _safe_prefetch(prefetch_linpsf_programs,
                           [int(t["starid"]) for t in by_method["linpsf"]])

    results = {}
    for method, group in by_method.items():
        sids = [int(t["starid"]) for t in group]
        # Warnings logged during the photometry are persisted into the
        # diagnostics errors column (BasePhotometry.py:171-179, 1409-1414):
        with capture_warnings() as log_messages:
            try:
                out = _run_method(ctx, sids, method,
                                  keep_diag=plot_folder is not None)
            except Exception:
                tb = traceback.format_exc().strip()
                logger.exception("Method %s failed for batch", method)
                out = [_error_result(t, ctx, tb) for t in group]
        if log_messages:
            for res in out:
                res.details.setdefault("errors", []).extend(log_messages)
        for task, res in zip(group, out):
            res.details.setdefault("task", {}).update(
                {k: task.get(k) for k in ("priority", "datasource")})
            results[int(task["starid"])] = (task, res)

    # Automatic halo switch (only for default-method targets):
    default_tasks = [t for t in tasks if not t.get("method")]
    switch = []
    for t in default_tasks:
        _, res = results[int(t["starid"])]
        if not str(t["datasource"]).startswith("tpf:") and _needs_halo_switch(
                res, tmag_limit, flux_limit):
            switch.append(t)
    if switch:
        sids = [int(t["starid"]) for t in switch]
        logger.warning("Auto-switching %d target(s) to halo photometry", len(sids))
        try:
            # Same decoration as the first-pass loop: warnings captured
            # during the halo rerun persist into the diagnostics errors
            # column, and the result carries the task metadata.
            with capture_warnings() as halo_messages:
                out = _run_method(ctx, sids, "halo")
            for t, res in zip(switch, out):
                prev_edge = results[int(t["starid"])][1].details.get("edge_flux")
                res.details["edge_flux"] = prev_edge
                res.details.setdefault("errors", []).append(
                    "Automatically switched to Halo photometry")
                if halo_messages:
                    res.details["errors"].extend(halo_messages)
                res.details.setdefault("task", {}).update(
                    {k: t.get(k) for k in ("priority", "datasource")})
                results[int(t["starid"])] = (t, res)
        except Exception:
            logger.exception("Halo switch failed; keeping aperture results")

    # Automatic deblend switch: aperture targets that are genuine blends —
    # a catalog neighbour holding >= [deblend] neighbour_flux_ratio of the
    # target's flux within neighbour_radius px — are re-run with linear-PSF
    # photometry, which fits the blend jointly instead of splitting pixels
    # at a watershed boundary whose flux assignment is ambiguous even in
    # the reference (heap-order-dependent flood; PARITY.md "Mask tie-break
    # bound", up to 23% |flux| delta).  A completeness catch additionally
    # reroutes truncated masks with any neighbour that close.  Thresholds
    # bound the DELIVERED aperture blends at p99 < 5% flux delta on the
    # tie-break corpus (tests/test_tiebreak_corpus.py).
    completeness_limit = settings.getfloat("deblend", "completeness_limit",
                                           fallback=0.9)
    radius = settings.getfloat("deblend", "neighbour_radius", fallback=6.0)
    switched_halo = {int(t["starid"]) for t in switch}
    deblend = []
    for t in default_tasks:
        sid = int(t["starid"])
        if sid in switched_halo or str(t["datasource"]).startswith("tpf"):
            continue
        _, res = results[sid]
        if (completeness_limit <= 0 or res.method != "aperture"
                or res.status not in (STATUS.OK, STATUS.WARNING)):
            continue
        comp = res.details.get("completeness")
        near_any = res.details.get("nearest_neighbour_px")
        near_sig = res.details.get("nearest_significant_neighbour_px")
        is_blend = near_sig is not None and near_sig <= radius
        truncated = (comp is not None and comp < completeness_limit
                     and near_any is not None and near_any <= radius)
        if is_blend or truncated:
            deblend.append(t)
    if deblend:
        sids = [int(t["starid"]) for t in deblend]
        logger.warning("Auto-switching %d blended target(s) to linPSF "
                       "photometry", len(sids))
        try:
            with capture_warnings() as lin_messages:
                out = _run_method(ctx, sids, "linpsf")
            for t, res in zip(deblend, out):
                if res.status not in (STATUS.OK, STATUS.WARNING):
                    continue  # keep the aperture result on linPSF failure
                prev = results[int(t["starid"])][1]
                res.details["completeness"] = prev.details.get("completeness")
                for key in ("nearest_neighbour_px",
                            "nearest_significant_neighbour_px"):
                    if prev.details.get(key) is not None:
                        res.details[key] = prev.details[key]
                res.details.setdefault("errors", []).append(
                    "Automatically switched to linPSF photometry "
                    f"(aperture mask completeness "
                    f"{100 * prev.details.get('completeness', float('nan')):.0f}%)")
                if lin_messages:
                    res.details["errors"].extend(lin_messages)
                res.details.setdefault("task", {}).update(
                    {k: t.get(k) for k in ("priority", "datasource")})
                results[int(t["starid"])] = (t, res)
        except Exception:
            logger.exception("Deblend switch failed; keeping aperture results")

    final = []
    for task in tasks:
        _, res = results[int(task["starid"])]
        if save and res.status in (STATUS.OK, STATUS.WARNING):
            outdir = output_folder
            if outdir is None:
                outdir = os.path.join(ctx.input_folder,
                                      f"c{ctx.cadence:04d}", f"{res.starid:011d}"[:5])
            try:
                res.save(outdir, version if version is not None else 1)
            except Exception:
                res.status = STATUS.ERROR
                res.details.setdefault("errors", []).append(traceback.format_exc().strip())
        if plot_folder is not None and res.status in (STATUS.OK, STATUS.WARNING):
            from ..diagnostics import plot_target_diagnostics
            plot_target_diagnostics(res, ctx, plot_folder)
        final.append(res)
    return final


def photometry_single(starid: int, input_folder: str, method: Optional[str] = None,
                      datasource: str = "ffi", sector: Optional[int] = None,
                      camera: Optional[int] = None, ccd: Optional[int] = None,
                      cadence: Optional[int] = None,
                      output_folder: Optional[str] = None,
                      version: Optional[int] = None, save: bool = True,
                      plot_folder: Optional[str] = None) -> TargetResult:
    """One-star entry point (reference tessphot.py call signature)."""
    task = {"starid": starid, "datasource": datasource, "sector": sector,
            "camera": camera, "ccd": ccd, "cadence": cadence, "method": method}
    try:
        # Context construction is inside the ERROR contract too (the
        # reference wraps photometry-object construction, tessphot.py:20-49):
        ctx = open_context(input_folder, task)
    except Exception:
        return _error_result(task, None, traceback.format_exc().strip())
    try:
        task.update({"sector": ctx.sector, "camera": ctx.camera, "ccd": ctx.ccd,
                     "cadence": ctx.cadence})
        return photometry_batch(ctx, [task], output_folder=output_folder,
                                version=version, save=save,
                                plot_folder=plot_folder)[0]
    finally:
        ctx.close()
