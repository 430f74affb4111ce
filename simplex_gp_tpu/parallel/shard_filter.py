"""Data-sharded lattice filter: explicit shard_map building blocks.

The reference is single-device (SURVEY.md section 2.7); this module is the
TPU-native multi-chip formulation of the permutohedral filter.  Sharding
model over a 1-D mesh axis (default ``"data"``):

  * every shard holds n_loc = n / P input points; geometry (elevate / round /
    rank / barycentric -> vertex hashes) is computed locally -- the O(n) work
    parallelizes perfectly;
  * the per-point hash pairs (8 bytes/vertex) are ``all_gather``-ed so every
    shard deterministically builds the IDENTICAL global dedup + neighbor
    tables (the lattice is the global shared state of this workload -- the
    analogue of the KV ring in ring attention);
  * splat produces per-shard partial lattice tables combined with ONE
    ``psum`` per filter application; blur is O(M) and runs replicated; slice
    reads back only local rows.

Communication per MVM: one psum of the (M, c) table.  Per plan build: one
all_gather of 2N int32.  CG / Lanczos / NLML reductions take the same
``axis_name`` (linalg/cg.py, linalg/lanczos.py, linalg/mll.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.lattice import (
    LatticePlan,
    _hash_vectors,
    _plan_tables,
    _point_hashes,
    apply_plan,
    build_rotation,
)

__all__ = ["build_plan_sharded", "filter_sharded"]


def build_plan_sharded(
    x_local: jax.Array, coeffs: tuple, blur_variance: float, axis_name: str
) -> LatticePlan:
    """Per-shard LatticePlan against the global lattice (call inside shard_map).

    ``seg_ids``/``weights`` cover only this shard's rows; ``neighbors`` and
    the implied table capacity M = n_global*(d+1) are global and identical
    on every shard (deterministic function of the all-gathered hashes).
    """
    n_loc, d = x_local.shape
    dp1 = d + 1
    order = (len(coeffs) - 1) // 2
    E = jnp.asarray(build_rotation(d, blur_variance))
    a = _hash_vectors(d)

    h1, h2, weights = _point_hashes(x_local, E, a)
    g1 = jax.lax.all_gather(h1, axis_name, tiled=True)  # (N_global,)
    g2 = jax.lax.all_gather(h2, axis_name, tiled=True)
    seg_all, neighbors, n_lattice = _plan_tables(g1, g2, d, order, a)

    shard = jax.lax.axis_index(axis_name)
    n_vert = n_loc * dp1
    seg_local = jax.lax.dynamic_slice_in_dim(seg_all, shard * n_vert, n_vert)
    return LatticePlan(
        seg_ids=seg_local.reshape(n_loc, dp1),
        weights=weights,
        neighbors=neighbors,
        n_lattice=n_lattice,
    )


def filter_sharded(src_local, ref_local, dk, axis_name: str):
    """K(ref, ref) @ src with both sharded over the data axis (in shard_map).

    Differentiable by plain autodiff: the all_gather/psum collectives
    transpose to psum_scatter/identity under JAX AD, so hyperparameter
    gradients flow across shards exactly (the sharded analogue of
    ops/filter.py lattice_filter_exact_grad).
    """
    plan = build_plan_sharded(ref_local, dk.coeffs, dk.variance, axis_name)
    return apply_plan(plan, src_local, dk.coeffs, axis_name=axis_name)
