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
from timeit import default_timer as _timer
from typing import Optional

import numpy as np

from ..io.settings import load_settings
from ..utils.logutils import capture_warnings
from ..utils.mathutils import mag2flux
from .engine import SectorContext, TpfContext, extract_aperture_batch, TargetResult
from .status import STATUS

logger = logging.getLogger(__name__)

__all__ = ["photometry_batch", "photometry_single", "open_context",
           "default_time_corrector", "ContextCache", "HaloSwitchQueue"]

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


def _run_halo_switch(ctx, switch: list, prev_results: dict):
    """Rerun halo photometry for switch candidates, decorated like the
    reference's automatic switch (tessphot.py:86-111): the aperture pass's
    edge_flux is carried over, the switch is recorded in the errors column,
    and captured warnings persist.  Returns the decorated results in task
    order, or None if the halo rerun itself failed (callers keep the
    aperture results, like the reference's try/except around the rerun).
    """
    sids = [int(t["starid"]) for t in switch]
    logger.warning("Auto-switching %d target(s) to halo photometry", len(sids))
    try:
        # Same decoration as the first-pass loop: warnings captured
        # during the halo rerun persist into the diagnostics errors
        # column, and the result carries the task metadata.
        with capture_warnings() as halo_messages:
            out = _run_method(ctx, sids, "halo")
    except Exception:
        logger.exception("Halo switch failed; keeping aperture results")
        return None
    for t, res in zip(switch, out):
        prev = prev_results[int(t["starid"])]
        res.details["edge_flux"] = prev.details.get("edge_flux")
        res.details.setdefault("errors", []).append(
            "Automatically switched to Halo photometry")
        if halo_messages:
            res.details["errors"].extend(halo_messages)
        res.details.setdefault("task", {}).update(
            {k: t.get(k) for k in ("priority", "datasource")})
    return out


class HaloSwitchQueue:
    """Accumulate halo-switch candidates across lease batches.

    The batched TV-min descent is latency-bound below ~32 targets — a
    typical 256-target lease yields only a handful of switch candidates,
    so rerunning them inline per batch pays the small-batch rate for the
    whole drain (BENCH r4: 265 targets/s at batch 8 vs 1,187 at 32).
    Candidates queue here instead and flush as one halo batch once
    ``min_flush`` accumulate, when the drain moves to a different context
    (the queue pins the SectorContext — flush BEFORE the ContextCache
    evicts it), or at drain end (``flush(force=True)``).

    Counterpart of the reference's per-target automatic switch
    (tessphot.py:86-111), batched.
    """

    def __init__(self, min_flush: Optional[int] = None, timers: Optional[dict] = None):
        if min_flush is None:
            min_flush = load_settings().getint("haloswitch", "min_batch",
                                               fallback=32)
        self.min_flush = max(int(min_flush), 1)
        self._ctx = None
        self._items = []      # (task, aperture TargetResult)
        self._save_args = {}
        self._timers = timers

    @property
    def pending(self) -> int:
        return len(self._items)

    def matches(self, task: dict) -> bool:
        """Is the pinned context safe across ``task``'s batch?

        TPF batches never evict the ContextCache's FFI slot (they open
        per-target contexts), so they can interleave without a flush; an
        FFI batch for a different CCD WILL evict (and close) the pinned
        context, so the caller must flush first.
        """
        if self._ctx is None:
            return True
        if task["datasource"] != "ffi":
            return True
        return (int(task["sector"]) == self._ctx.sector
                and int(task["camera"]) == self._ctx.camera
                and int(task["ccd"]) == self._ctx.ccd)

    def add(self, ctx, task: dict, aperture_result, **save_args):
        assert ctx.datasource == "ffi", "TPF contexts are per-batch; defer only FFI"
        assert self._ctx is None or self._ctx is ctx, \
            "flush the queue before switching contexts"
        self._ctx = ctx
        self._save_args = save_args
        self._items.append((task, aperture_result))

    def should_flush(self) -> bool:
        return len(self._items) >= self.min_flush

    def flush(self, force: bool = False) -> list:
        """Run the queued halo batch; returns resolved ``(task, result)``.

        Below ``min_flush`` and not ``force``, returns [] (keeps queueing).
        If the halo rerun fails, the original aperture results are resolved
        instead (exactly the inline fallback).  Light-curve products are
        written here with the save arguments captured at add-time.
        """
        if not self._items or (not force and not self.should_flush()):
            return []
        items, ctx = self._items, self._ctx
        self._items, self._ctx = [], None
        tasks = [t for t, _ in items]
        prev = {int(t["starid"]): r for t, r in items}
        tic = _timer()
        out = _run_halo_switch(ctx, tasks, prev)
        if self._timers is not None:
            self._timers["photometry"] += _timer() - tic
        if out is None:
            out = [r for _, r in items]
            for r in out:
                r.details.pop("halo_switch_deferred", None)
        sa = self._save_args
        if sa.get("save", True):
            _save_results_parallel(ctx, out, sa.get("output_folder"),
                                   sa.get("version"), timers=self._timers)
        if sa.get("plot_folder"):
            from ..diagnostics import plot_target_diagnostics
            for res in out:
                if res.status in (STATUS.OK, STATUS.WARNING):
                    plot_target_diagnostics(res, ctx, sa["plot_folder"])
        return list(zip(tasks, out))


def photometry_batch(ctx, tasks: list, output_folder: Optional[str] = None,
                     version: Optional[int] = None, save: bool = True,
                     plot_folder: Optional[str] = None,
                     halo_queue: Optional[HaloSwitchQueue] = None,
                     timers: Optional[dict] = None) -> list:
    """Run photometry for a batch of compatible tasks on one context.

    Tasks without an explicit method run aperture photometry; bright targets
    matching the halo-switch condition are rerun with halo.  Exceptions per
    method-group degrade to STATUS.ERROR results rather than killing the
    batch.  When ``save``, light curves of OK/WARNING results are written.
    When ``plot_folder`` is given, per-target diagnostic figures are rendered
    into ``<plot_folder>/plots/<starid>/`` (reference BasePhotometry.py:394-397;
    see :mod:`photometry_tpu.diagnostics`).

    With ``halo_queue``, FFI halo-switch candidates are queued for a later
    batched rerun instead of rerunning inline; their (interim) results come
    back flagged ``details["halo_switch_deferred"]`` and must be withheld
    from save_result until :meth:`HaloSwitchQueue.flush` resolves them.

    ``timers`` (a core.drain.new_timers dict) accumulates the wall of the
    photometry phase (device programs + their host pre/post) vs the product
    ``save`` phase, for the drain's end-to-end decomposition.
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
        tic = _timer()
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
        if timers is not None:
            timers["photometry"] += _timer() - tic
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
    if switch and halo_queue is not None and ctx.datasource == "ffi":
        # Deferred mode: the batched TV-min program is latency-bound below
        # ~32 targets (bench: 265 targets/s at the typical per-lease 8 vs
        # 1,187 at 32) — queue candidates across lease batches and flush
        # once enough accumulate (or at context change / drain end), so
        # production pays the batch-32 rate.  The caller holds these
        # results back from save_result until the flush resolves them.
        for t in switch:
            sid = int(t["starid"])
            halo_queue.add(ctx, t, results[sid][1],
                           save=save, output_folder=output_folder,
                           version=version, plot_folder=plot_folder)
            results[sid][1].details["halo_switch_deferred"] = True
    elif switch:
        tic = _timer()
        out = _run_halo_switch(ctx, switch,
                               {int(t["starid"]): results[int(t["starid"])][1]
                                for t in switch})
        if timers is not None:
            timers["photometry"] += _timer() - tic
        if out is not None:
            for t, res in zip(switch, out):
                results[int(t["starid"])] = (t, res)

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
        tic = _timer()
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
        if timers is not None:
            timers["photometry"] += _timer() - tic

    final = [results[int(task["starid"])][1] for task in tasks]
    if save:
        _save_results_parallel(ctx, final, output_folder, version,
                               timers=timers)
    if plot_folder is not None:
        from ..diagnostics import plot_target_diagnostics
        for res in final:
            if (res.status in (STATUS.OK, STATUS.WARNING)
                    and not res.details.get("halo_switch_deferred")):
                plot_target_diagnostics(res, ctx, plot_folder)
    return final


def _save_results_parallel(ctx, results: list, output_folder, version,
                           timers: Optional[dict] = None):
    """Write light-curve products for OK/WARNING results, concurrently.

    The per-target FITS+gzip write is the drain's hot host loop (the device
    extracts >10k targets/s; a serial writer caps the pipeline at the
    single-thread product rate).  zlib's deflate releases the GIL, so a
    small thread pool ([products] writer_threads) overlaps compression
    across targets.  All writes complete before returning; the failure
    contract stays the reference's: a failed write demotes that target to
    STATUS.ERROR with the traceback (BasePhotometry.py:1417-1728 via
    tessphot.py:20-49).
    """
    tic = _timer()
    jobs = []
    for res in results:
        if res.status not in (STATUS.OK, STATUS.WARNING):
            continue
        if res.details.get("halo_switch_deferred"):
            continue  # resolved (and written) later by HaloSwitchQueue.flush
        outdir = output_folder
        if outdir is None:
            outdir = os.path.join(ctx.input_folder,
                                  f"c{ctx.cadence:04d}", f"{res.starid:011d}"[:5])
        jobs.append((res, outdir))
    if not jobs:
        return

    def _write(res, outdir):
        try:
            res.save(outdir, version if version is not None else 1)
        except Exception:
            res.status = STATUS.ERROR
            res.details.setdefault("errors", []).append(
                traceback.format_exc().strip())

    workers = load_settings().getint("products", "writer_threads", fallback=4)
    if workers <= 0 or len(jobs) == 1:
        for res, outdir in jobs:
            _write(res, outdir)
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(workers, len(jobs))) as pool:
            list(pool.map(lambda j: _write(*j), jobs))
    if timers is not None:
        timers["save"] += _timer() - tic
        timers["n_products"] = timers.get("n_products", 0) + len(jobs)


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
