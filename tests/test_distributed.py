"""Multi-host runtime unit tests (single-process degenerate forms).

True multi-process behavior needs multiple hosts; these tests pin down the
single-process contracts every launcher relies on: no-op init without a
coordinator, the global mesh spanning all (virtual) devices, and per-host
array feeding agreeing with the single-host shard_batch path.
"""

import numpy as np
from jax.sharding import PartitionSpec as P

from simplex_gp_tpu.parallel import (
    global_mesh,
    host_local_batch,
    initialize_distributed,
    is_distributed,
    shard_batch,
)


def test_initialize_noop_without_coordinator(monkeypatch):
    for v in ("JAX_COORDINATOR_ADDRESS", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(v, raising=False)
    assert initialize_distributed() is False
    assert is_distributed() is False


def test_global_mesh_spans_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    assert mesh.axis_names == ("data",)


def test_host_local_batch_matches_shard_batch():
    mesh = global_mesh()
    x = np.arange(64, dtype=np.float32).reshape(16, 4)
    y = np.arange(16, dtype=np.float32)
    gx, gy = host_local_batch(mesh, x, y)
    sx, sy = shard_batch(mesh, x, y)
    assert gx.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(sx))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(sy))
