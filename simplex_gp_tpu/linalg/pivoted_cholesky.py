"""Partial pivoted Cholesky preconditioner for BBMM CG.

GPyTorch preconditions ``K + sigma^2 I`` with a rank-k pivoted Cholesky of K
plus the noise (``max_preconditioner_size=100`` in the reference config;
SURVEY.md section 2.4).  Pivoted Cholesky needs *columns* of K; for an
implicit lattice operator a column is one MVM against a one-hot vector, so
building the rank-k factor costs k extra MVMs per loss evaluation -- the same
asymptotics GPyTorch pays.

The factorization loop is a ``lax.fori_loop`` with static rank (data-dependent
pivots are traced values; shapes stay static).  The preconditioner solve uses
the Woodbury identity and its log-determinant the matrix determinant lemma,
both O(n k^2).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["PivotedCholesky", "pivoted_cholesky", "woodbury_solve", "woodbury_logdet"]


class PivotedCholesky(NamedTuple):
    L: jax.Array  # (n, k) partial Cholesky factor of K (without noise)
    pivots: jax.Array  # (k,) chosen pivot indices


def pivoted_cholesky(
    diag: jax.Array,
    col_fn: Callable[[jax.Array], jax.Array],
    rank: int,
) -> PivotedCholesky:
    """Rank-``rank`` pivoted Cholesky of an SPSD matrix given by columns.

    Args:
      diag: (n,) the diagonal of K (ones * outputscale for normalized lattice
        kernels, reference bilateral_kernel.py:139-140).
      col_fn: i (traced scalar) -> K[:, i] as an (n,) array (one MVM).
      rank: number of pivots (static).
    """
    n = diag.shape[0]

    def body(j, state):
        L, d, pivots = state
        piv = jnp.argmax(d)
        col = col_fn(piv)  # (n,)
        # Subtract the already-factored part: L[:, :j] @ L[piv, :j].
        jj = jnp.arange(L.shape[1])
        mask = (jj < j).astype(L.dtype)
        col = col - (L * (L[piv] * mask)[None, :]).sum(axis=-1)
        pivot_val = jnp.maximum(d[piv], 1e-12)
        ell = col / jnp.sqrt(pivot_val)
        ell = ell.at[piv].set(jnp.sqrt(pivot_val))
        L = L.at[:, j].set(ell)
        d = jnp.maximum(d - ell * ell, 0.0)
        d = d.at[piv].set(0.0)
        pivots = pivots.at[j].set(piv)
        return L, d, pivots

    L0 = jnp.zeros((n, rank), jnp.float32)
    piv0 = jnp.zeros((rank,), jnp.int32)
    L, _, pivots = jax.lax.fori_loop(0, rank, body, (L0, diag.astype(jnp.float32), piv0))
    return PivotedCholesky(L=L, pivots=pivots)


def woodbury_solve(L: jax.Array, noise: jax.Array, V: jax.Array) -> jax.Array:
    """(L L^T + noise I)^{-1} V via Woodbury, O(n k^2 + n k t)."""
    k = L.shape[1]
    inner = noise * jnp.eye(k, dtype=L.dtype) + L.T @ L  # (k, k)
    chol = jnp.linalg.cholesky(inner)
    lt_v = L.T @ V
    sol = jax.scipy.linalg.cho_solve((chol, True), lt_v)
    return (V - L @ sol) / noise


def woodbury_logdet(L: jax.Array, noise: jax.Array, n: int) -> jax.Array:
    """log|L L^T + noise I| via the matrix determinant lemma."""
    k = L.shape[1]
    inner = jnp.eye(k, dtype=L.dtype) + (L.T @ L) / noise
    chol = jnp.linalg.cholesky(inner)
    return 2.0 * jnp.log(jnp.diag(chol)).sum() + n * jnp.log(noise)
