"""
Multi-host device meshes via ``jax.distributed`` (the pod-slice seam).

The reference scales across hosts with MPI ranks (run_tessphot_mpi.py) —
share-nothing workers, all bulk data through the filesystem.  This framework
keeps that pull-scheduler design for *independent* task batches
(``parallel/scheduler.py``: pipes locally, TCP across hosts), but a TPU pod
slice also supports a second, stronger mode the reference cannot express:
**one sharded program spanning every chip of every host**, with XLA inserting
the collectives.  That is what this module wires up.

Axis placement rule (scaling-book recipe — collectives must ride the fast
interconnect):

- the **time** axis crosses hosts (DCN): the only time-axis traffic in the
  pipeline is the nearest-neighbour ``ppermute`` halo exchange of the
  background-smoothing window plus O(H*W) ``psum`` sum-images — small,
  latency-tolerant, fine over DCN;
- the **targets** axis stays inside a host (ICI): per-target reductions and
  the all-gathers of replicated ephemeris/catalog operands are
  bandwidth-hungry and must not cross hosts.

:func:`global_mesh` enforces this by ordering the global device list so every
mesh *row* (one time index, all target indices) is a block of chips from a
single process.

Typical multi-host launch (same program on every host)::

    from photometry_tpu.parallel import multihost
    multihost.initialize()                  # env-autodetected on SLURM/GKE
    mesh = multihost.global_mesh(n_targets=4)
    # ... build SectorContext with cube_sharding(mesh), run sharded_* ops ...

Single-host runs skip ``initialize`` (or call it — it is a no-op without a
coordinator) and every helper degrades to the local-mesh behaviour of
``parallel/mesh.py``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

from .mesh import TARGET_AXIS, TIME_AXIS

logger = logging.getLogger(__name__)

__all__ = [
    "initialize", "shutdown", "is_initialized", "global_mesh",
    "process_shard", "local_data_slice",
]

_initialized = False


def is_initialized() -> bool:
    """True when this process joined a ``jax.distributed`` coordination
    service (and :func:`shutdown` has not been called)."""
    return _initialized


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> int:
    """Join (or start) the multi-host coordination service.

    Thin, idempotent wrapper over ``jax.distributed.initialize``:

    - with no arguments, defers to JAX's cluster autodetection (SLURM,
      Open MPI, GKE/TPU-pod metadata) and becomes a **no-op** when no cluster
      environment is present — so single-host code can call it
      unconditionally;
    - with explicit arguments, wires a bare-metal fleet: the process with
      ``process_id == 0`` must be reachable at ``coordinator_address``.

    Returns this process's index (0 on single-host).  Call **before** the
    first ``jax.devices()`` touch, per JAX's contract.
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_index()
    explicit = coordinator_address is not None
    # PHOTOMETRY_TPU_MULTIHOST=1 forces the jax.distributed autodetect path
    # on clusters whose coordination channel is not in the env-var list below
    # (e.g. GKE/TPU-pod metadata servers).
    forced = os.environ.get("PHOTOMETRY_TPU_MULTIHOST", "") not in ("", "0")
    autodetectable = forced or any(v in os.environ for v in (
        "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "TPU_WORKER_HOSTNAMES",
        "JAX_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID"))
    if not explicit and not autodetectable:
        logger.warning(
            "multihost.initialize: no coordinator address and no recognised "
            "cluster environment — running single-host. If this IS a pod "
            "slice, set PHOTOMETRY_TPU_MULTIHOST=1 to force the "
            "jax.distributed autodetect path.")
        return 0
    kwargs = {}
    if explicit:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=list(local_device_ids))
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info("multihost: process %d/%d joined, %d global / %d local devices",
                jax.process_index(), jax.process_count(),
                jax.device_count(), jax.local_device_count())
    return jax.process_index()


def shutdown() -> None:
    """Leave the coordination service (test/teardown hook)."""
    global _initialized
    if not _initialized:
        return
    import jax
    jax.distributed.shutdown()
    _initialized = False


def _order_devices(devices, n_targets: int):
    """Order a global device list so each (time-)row of an
    ``(n_time, n_targets)`` mesh is a single-process block.

    Devices are grouped by ``process_index`` (stable within a process by
    ``id``); each process's block is then split into rows of ``n_targets``.
    Raises when ``n_targets`` does not divide every process's local device
    count — a row straddling two hosts would put target-axis collectives on
    DCN, which this layout exists to prevent.
    """
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    ordered = []
    for proc in sorted(by_proc):
        block = sorted(by_proc[proc], key=lambda d: getattr(d, "id", 0))
        if len(block) % n_targets != 0:
            raise ValueError(
                f"n_targets={n_targets} does not divide process {proc}'s "
                f"{len(block)} local devices; a mesh row would cross hosts "
                f"and put target collectives on DCN")
        ordered.extend(block)
    return ordered


def global_mesh(n_time: Optional[int] = None,
                n_targets: Optional[int] = None,
                devices=None):
    """A 2-D ``(time, targets)`` mesh over **all** processes' devices, laid
    out so the targets axis never crosses a host boundary.

    Defaults mirror ``mesh.make_mesh``: everything on the time axis unless a
    target split is requested.  On a single host this is exactly
    ``make_mesh`` (modulo the host-blocked device order, which is then the
    natural order anyway).
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_time is None and n_targets is None:
        n_time, n_targets = n, 1
    elif n_time is None:
        n_time = n // n_targets
    elif n_targets is None:
        n_targets = n // n_time
    if n_time * n_targets != n:
        raise ValueError(f"mesh {n_time}x{n_targets} != {n} devices")
    ordered = np.asarray(_order_devices(devices, n_targets), dtype=object)
    return Mesh(ordered.reshape(n_time, n_targets), (TIME_AXIS, TARGET_AXIS))


def process_shard(items: Sequence, process_id: Optional[int] = None,
                  process_count: Optional[int] = None) -> list:
    """This host's strided slice of a host-level work list (e.g. the CCD
    cubes of a sector, or plot/movie jobs).

    Round-robin (``items[pid::count]``) so heterogeneous item costs
    self-balance about as well as a static split can; use the pull scheduler
    when true dynamic balancing matters.

    Raises on an inconsistent (pid, count) pair: a misconfiguration (1-based
    ids, count=0) would otherwise silently hand two hosts overlapping shards
    and have them write the same output files concurrently.
    """
    import jax
    pid = jax.process_index() if process_id is None else process_id
    count = jax.process_count() if process_count is None else process_count
    if count < 1:
        raise ValueError(f"process_count must be >= 1, got {count}")
    if not 0 <= pid < count:
        raise ValueError(
            f"process_id {pid} outside [0, {count}) — ids are 0-based; an "
            f"out-of-range id would silently overlap another host's shard")
    return list(items)[pid::count]


def local_data_slice(n_rows: int, mesh=None, axis: str = TIME_AXIS,
                     process_id: Optional[int] = None) -> slice:
    """The contiguous row range of a globally ``axis``-sharded array that
    this process must produce locally.

    Multi-host ``jax.make_array_from_process_local_data`` (and
    ``device_put`` with a ``NamedSharding``) require each process to hold
    exactly its addressable shard; hosts read only their own frame range
    from disk — bulk pixels never cross DCN.  With the host-blocked device
    order of :func:`global_mesh`, each process's time-rows are contiguous.
    """
    import jax
    if mesh is None:
        mesh = global_mesh()
    n_axis = mesh.shape[axis]
    if n_rows % n_axis != 0:
        raise ValueError(f"{n_rows} rows not divisible by {axis}={n_axis}")
    per = n_rows // n_axis
    axis_idx = list(mesh.axis_names).index(axis)
    pid = jax.process_index() if process_id is None else process_id
    # Rows of `axis` owned by this process, in mesh coordinate order.
    rows = np.moveaxis(mesh.devices, axis_idx, 0)
    coords = [i for i in range(n_axis)
              if any(getattr(d, "process_index", 0) == pid
                     for d in rows[i].flat)]
    if not coords:
        raise ValueError(f"process {pid} owns no devices on axis {axis!r}")
    lo, hi = min(coords), max(coords)
    if coords != list(range(lo, hi + 1)):
        raise ValueError("process-local rows are not contiguous — was the "
                         "mesh built by global_mesh()?")
    # Exclusive ownership: a row mixing hosts would hand two processes
    # overlapping "local" slices while each passes the contiguity check.
    for i in coords:
        owners = {getattr(d, "process_index", 0) for d in rows[i].flat}
        if owners != {pid}:
            raise ValueError(
                f"axis {axis!r} row {i} is shared by processes "
                f"{sorted(owners)} — rows must be exclusively owned; was "
                f"the mesh built by global_mesh()?")
    return slice(lo * per, (hi + 1) * per)
