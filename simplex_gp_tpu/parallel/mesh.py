"""Device-mesh utilities and data-sharded GP training.

The reference is strictly single-process/single-device (SURVEY.md section
2.7); multi-chip scaling is a new, first-class capability of this framework.
The natural parallel axis of the workload is the DATA axis n of the kernel
MVM and CG:

  * x, y, probes, and all CG/Lanczos state shard over mesh axis "data";
  * splat (segment_sum onto the lattice) becomes a partial-sum + cross-device
    reduction; slice is local to each shard's points;
  * CG inner products and NLML terms are global reductions over n.

Round-1 implementation strategy: GSPMD.  The whole NLML/gradient step is
jitted with NamedSharding'd inputs and XLA's SPMD partitioner propagates the
data sharding through sort/segment_sum/gather, inserting the collectives
(psum for reductions, all-to-all for the dedup sort) over ICI.  An explicit
shard_map lattice with blur sharded over lattice rows is the planned
optimized path (SURVEY.md section 7, build step 8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_loss_fn"]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the data axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data", remainder: str = "truncate"):
    """Place arrays with their leading (data) axis sharded over the mesh.

    The leading axis must be a multiple of the mesh size; by default the
    remainder rows are DROPPED (``remainder="truncate"``) -- zero-padding
    would inject fake data points into the GP.  Pass ``remainder="error"``
    to require exact divisibility.
    """
    n_dev = mesh.devices.size
    n = min(a.shape[0] for a in arrays)
    n_keep = (n // n_dev) * n_dev
    if n_keep != n and remainder == "error":
        raise ValueError(f"leading axis {n} not divisible by mesh size {n_dev}")
    out = []
    for a in arrays:
        a = np.asarray(a)[:n_keep]
        spec = P(axis_name, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out[0] if len(out) == 1 else tuple(out)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. raw params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def data_parallel_loss_fn(model, mesh: Mesh, axis_name: str = "data"):
    """Jitted (loss, grads) function with data-sharded inputs.

    Params are replicated; x/y shard over the leading axis.  Returns a
    function (raw, x, y, key) -> (loss, grads) whose computation XLA
    partitions over the mesh.
    """

    def loss(raw, x, y, key):
        return model.nlml(raw, x, y, key)

    vg = jax.value_and_grad(loss)

    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    data2 = NamedSharding(mesh, P(axis_name, None))

    return jax.jit(
        vg,
        in_shardings=(rep, data2, data, rep),
        out_shardings=(rep, rep),
    )
