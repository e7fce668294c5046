"""
Multi-host mesh layer (`parallel/multihost.py`).

The layout logic (DCN on the time axis, ICI-only target rows) is tested with
fake device objects carrying `process_index`/`id`; the real
``jax.distributed`` handshake is exercised end-to-end in a one-process
coordinator subprocess (CPU backend), which runs the full
initialize -> global_mesh -> sharded psum -> shutdown path.

Reference counterpart being replaced: MPI rank startup in
run_tessphot_mpi.py:151-209 (share-nothing ranks; no global device program).
"""

import subprocess
import sys
import textwrap

import numpy as np
import pytest

from photometry_tpu.parallel import multihost
from photometry_tpu.parallel.mesh import TARGET_AXIS, TIME_AXIS


class FakeDev:
    def __init__(self, proc, did):
        self.process_index = proc
        self.id = did

    def __repr__(self):  # pragma: no cover
        return f"d{self.process_index}.{self.id}"


def _fleet(n_proc, per_host):
    # Interleaved + shuffled arrival order, as jax.devices() gives no
    # host-blocking guarantee worth relying on.
    devs = [FakeDev(p, p * 100 + i) for p in range(n_proc)
            for i in range(per_host)]
    rng = np.random.default_rng(7)
    rng.shuffle(devs)
    return devs


def test_order_devices_host_blocked_rows():
    devs = _fleet(n_proc=4, per_host=4)
    ordered = multihost._order_devices(devs, n_targets=4)
    rows = [ordered[i:i + 4] for i in range(0, 16, 4)]
    for row in rows:
        procs = {d.process_index for d in row}
        assert len(procs) == 1, f"mesh row crosses hosts: {row}"
    # Processes appear in index order, devices stable within a process.
    assert [r[0].process_index for r in rows] == [0, 1, 2, 3]
    assert [d.id for d in rows[2]] == [200, 201, 202, 203]


def test_order_devices_rejects_row_straddle():
    devs = _fleet(n_proc=2, per_host=4)
    with pytest.raises(ValueError, match="cross hosts"):
        multihost._order_devices(devs, n_targets=8)  # row > one host
    with pytest.raises(ValueError, match="cross hosts"):
        multihost._order_devices(devs, n_targets=3)  # 3 does not divide 4


def test_global_mesh_single_host_matches_make_mesh():
    import jax
    mesh = multihost.global_mesh(n_targets=2)
    assert mesh.shape == {TIME_AXIS: jax.device_count() // 2, TARGET_AXIS: 2}
    assert set(np.asarray(mesh.devices).flat) == set(jax.devices())


class FakeMesh:
    """Just enough Mesh surface for local_data_slice."""

    def __init__(self, devices, axis_names):
        self.devices = np.asarray(devices, dtype=object)
        self.axis_names = axis_names
        self.shape = dict(zip(axis_names, self.devices.shape))


def test_local_data_slice_per_process_rows():
    # 4 hosts x 4 chips, mesh (time=8, targets=2): each host owns 2
    # contiguous time rows -> a quarter of the frames.
    ordered = multihost._order_devices(_fleet(4, 4), n_targets=2)
    mesh = FakeMesh(np.asarray(ordered, dtype=object).reshape(8, 2),
                    (TIME_AXIS, TARGET_AXIS))
    T = 1312
    slices = [multihost.local_data_slice(T, mesh, process_id=p)
              for p in range(4)]
    assert slices == [slice(0, 328), slice(328, 656),
                      slice(656, 984), slice(984, 1312)]
    with pytest.raises(ValueError, match="not divisible"):
        multihost.local_data_slice(13, mesh, process_id=0)
    with pytest.raises(ValueError, match="owns no devices"):
        multihost.local_data_slice(T, mesh, process_id=9)


def test_local_data_slice_rejects_non_contiguous():
    devs = _fleet(2, 2)
    ordered = multihost._order_devices(devs, n_targets=1)
    # Interleave hosts along time: 0,1,0,1 — a layout global_mesh never makes.
    bad = [ordered[0], ordered[2], ordered[1], ordered[3]]
    mesh = FakeMesh(np.asarray(bad, dtype=object).reshape(4, 1),
                    (TIME_AXIS, TARGET_AXIS))
    with pytest.raises(ValueError, match="not contiguous"):
        multihost.local_data_slice(8, mesh, process_id=0)


def test_process_shard_round_robin():
    items = list(range(10))
    shards = [multihost.process_shard(items, process_id=p, process_count=3)
              for p in range(3)]
    assert shards == [[0, 3, 6, 9], [1, 4, 7], [2, 5, 8]]
    assert sorted(sum(shards, [])) == items


def test_process_shard_rejects_bad_ids():
    # 1-based ids (pid == count) would silently overlap host 0's shard.
    with pytest.raises(ValueError, match="0-based"):
        multihost.process_shard([1, 2, 3], process_id=3, process_count=3)
    with pytest.raises(ValueError, match="0-based"):
        multihost.process_shard([1, 2, 3], process_id=-1, process_count=3)
    # count < 1 would hand every host a near-full overlapping list.
    with pytest.raises(ValueError, match="process_count"):
        multihost.process_shard([1, 2, 3], process_id=0, process_count=0)


def test_local_data_slice_rejects_shared_rows():
    # A hand-built mesh where a time row mixes two hosts: both processes
    # pass the contiguity check but would get overlapping "local" slices.
    devs = _fleet(2, 2)
    ordered = multihost._order_devices(devs, n_targets=1)
    mixed = np.asarray([[ordered[0], ordered[2]],
                        [ordered[1], ordered[3]]], dtype=object)
    mesh = FakeMesh(mixed, (TIME_AXIS, TARGET_AXIS))
    with pytest.raises(ValueError, match="exclusively owned"):
        multihost.local_data_slice(8, mesh, process_id=0)


def test_initialize_noop_without_cluster(monkeypatch):
    for v in ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "TPU_WORKER_HOSTNAMES",
              "JAX_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID",
              "PHOTOMETRY_TPU_MULTIHOST"):
        monkeypatch.delenv(v, raising=False)
    assert multihost.initialize() == 0
    assert not multihost.is_initialized()


_SMOKE = textwrap.dedent("""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from photometry_tpu.parallel import multihost

    pid = multihost.initialize("localhost:%d", num_processes=1, process_id=0)
    assert pid == 0 and multihost.is_initialized()
    mesh = multihost.global_mesh(n_targets=2)
    assert mesh.shape == {"time": 2, "targets": 2}
    sl = multihost.local_data_slice(8, mesh)
    assert sl == slice(0, 8), sl
    x = jax.device_put(np.arange(8.0).reshape(8, 1),
                       NamedSharding(mesh, P("time", None)))
    s = jax.jit(lambda a: a.sum())(x)
    assert float(s) == 28.0
    multihost.shutdown()
    print("MULTIHOST_OK")
""")


def test_distributed_smoke_subprocess(tmp_path):
    """Full jax.distributed handshake, one-process coordinator, CPU."""
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", _SMOKE % port],
                          capture_output=True, text=True, timeout=240,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MULTIHOST_OK" in proc.stdout
