"""
Device meshes and shardings for multi-chip photometry.

The reference scales out with an MPI task-pull scheduler over share-nothing
workers (run_tessphot_mpi.py) — all bulk data through the filesystem.  The
TPU-native equivalents here are:

- the *time* axis of a sector cube sharded across devices ("context
  parallelism" for image stacks that exceed one chip's HBM; SURVEY §5), and
- the *targets* axis of an extraction batch sharded across devices
  (data parallelism over stars).

Collectives ride the ICI mesh: per-frame ops need no communication; the
time-smoothing window exchanges halo frames with ``ppermute``; sum-images
and per-target metrics reduce with ``psum`` over the time axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "parse_mesh_spec", "cube_sharding",
           "targets_sharding", "replicated"]

TIME_AXIS = "time"
TARGET_AXIS = "targets"


def parse_mesh_spec(spec: str) -> Mesh:
    """Build a mesh from a CLI spec like ``time=4,targets=2``.

    Accepted forms: ``time=N``, ``targets=M``, ``time=N,targets=M``, or a
    bare device count ``N`` (all on the time axis).  ``auto`` uses every
    available device on the time axis.  The production CLIs
    (photometry_cmd/scheduler_cmd ``--mesh``) route sector cubes through
    this mesh — the TPU-native counterpart of launching the reference under
    ``mpiexec`` (run_tessphot_mpi.py).
    """
    spec = (spec or "").strip().lower()
    if not spec:
        raise ValueError("empty mesh spec")
    if spec == "auto":
        return make_mesh()
    kw = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            key, _, val = part.partition("=")
            key = key.strip()
            if key not in (TIME_AXIS, TARGET_AXIS):
                raise ValueError(f"unknown mesh axis {key!r} "
                                 f"(expected {TIME_AXIS!r} or {TARGET_AXIS!r})")
            kw["n_time" if key == TIME_AXIS else "n_targets"] = int(val)
        else:
            kw["n_time"] = int(part)
    # An explicit spec consumes exactly n_time*n_targets devices (an omitted
    # axis defaults to 1) so e.g. 'time=4' works on an 8-device host:
    n_time = kw.get("n_time", 1)
    n_targets = kw.get("n_targets", 1)
    devices = jax.devices()
    if n_time * n_targets > len(devices):
        raise ValueError(f"mesh spec {spec!r} needs {n_time * n_targets} "
                         f"devices; only {len(devices)} available")
    return make_mesh(n_time=n_time, n_targets=n_targets,
                     devices=devices[:n_time * n_targets])


def make_mesh(n_time: Optional[int] = None, n_targets: Optional[int] = None,
              devices=None) -> Mesh:
    """A 2-D (time, targets) device mesh.

    Defaults: all devices on the time axis (the memory-bound axis) when no
    split is given.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_time is None and n_targets is None:
        n_time, n_targets = n, 1
    elif n_time is None:
        n_time = n // n_targets
    elif n_targets is None:
        n_targets = n // n_time
    if n_time * n_targets != n:
        raise ValueError(f"mesh {n_time}x{n_targets} != {n} devices")
    return Mesh(devices.reshape(n_time, n_targets), (TIME_AXIS, TARGET_AXIS))


def cube_sharding(mesh: Mesh) -> NamedSharding:
    """(T, H, W) cubes sharded along the time axis."""
    return NamedSharding(mesh, P(TIME_AXIS, None, None))


def targets_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """(N, ...) per-target arrays sharded along the targets axis."""
    return NamedSharding(mesh, P(TARGET_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
