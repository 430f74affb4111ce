"""Device-mesh utilities and data-sharded GP training.

The reference is strictly single-process/single-device (SURVEY.md section
2.7); multi-chip scaling is a new, first-class capability of this framework.
The natural parallel axis of the workload is the DATA axis n of the kernel
MVM and CG:

  * x, y, probes, and all CG/Lanczos state shard over mesh axis "data";
  * splat (segment_sum onto the lattice) becomes a partial-sum + cross-device
    reduction; slice is local to each shard's points;
  * CG inner products and NLML terms are global reductions over n.

Primary path: EXPLICIT shard_map (``data_parallel_loss_fn``) -- per-shard
lattice geometry, all_gather of the vertex hashes for the (replicated)
global dedup/neighbor tables, one psum per filter MVM to combine the
per-shard lattice tables, psum'd CG/Lanczos inner products
(parallel/shard_filter.py; SURVEY.md section 7, build step 8).
``gspmd_loss_fn`` keeps the compiler-partitioned alternative as a
cross-check.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_loss_fn", "gspmd_loss_fn"]


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
    """Explicit shard_map (loss, grads) function over the data axis.

    Params are replicated; x/y shard over the leading axis.  Inside the
    shard each device runs the data-sharded BBMM engine (per-shard lattice
    geometry, one psum per filter MVM for the global lattice table, psum'd
    CG/Lanczos inner products -- parallel/shard_filter.py); parameter
    gradients are partial per shard and combined with one final psum.
    """
    def per_shard(raw, x_loc, y_loc, key):
        loss, grads = jax.value_and_grad(
            lambda r: model.nlml(r, x_loc, y_loc, key, axis_name=axis_name)
        )(raw)
        # loss is already global (psum'd inside the engine); grads are this
        # shard's partial contributions.
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis_name), grads)
        return loss, grads

    mapped = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def gspmd_loss_fn(model, mesh: Mesh, axis_name: str = "data"):
    """GSPMD alternative: jit the single-device NLML with sharded inputs and
    let XLA's SPMD partitioner propagate shardings/collectives.  Kept as a
    cross-check against the explicit shard_map path."""

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
