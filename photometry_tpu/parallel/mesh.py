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

__all__ = ["make_mesh", "cube_sharding", "targets_sharding", "replicated"]

TIME_AXIS = "time"
TARGET_AXIS = "targets"


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
