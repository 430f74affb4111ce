"""Unit tests for the BBMM engine primitives against dense linear algebra."""

import jax
import jax.numpy as jnp
import numpy as np

from simplex_gp_tpu.linalg import (
    cg_solve,
    lanczos,
    pivoted_cholesky,
    slq_logdet,
    tridiag_matrices,
    woodbury_logdet,
    woodbury_solve,
)


def _spd(n, seed, cond=100.0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    evals = np.geomspace(1.0, cond, n)
    return (Q * evals) @ Q.T


def test_cg_matches_dense_solve():
    n, t = 64, 3
    A = jnp.asarray(_spd(n, 0), jnp.float32)
    rng = np.random.default_rng(1)
    B = jnp.asarray(rng.normal(size=(n, t)), jnp.float32)
    res = cg_solve(lambda v: A @ v, B, tol=1e-6, max_iters=200)
    expected = np.linalg.solve(np.asarray(A, np.float64), np.asarray(B, np.float64))
    np.testing.assert_allclose(np.asarray(res.x), expected, rtol=2e-3, atol=2e-3)
    assert int(res.iterations) < 200


def test_cg_early_stop_tolerance():
    n = 64
    A = jnp.asarray(_spd(n, 2, cond=10.0), jnp.float32)
    b = jnp.ones((n, 1), jnp.float32)
    loose = cg_solve(lambda v: A @ v, b, tol=0.5, max_iters=200)
    tight = cg_solve(lambda v: A @ v, b, tol=1e-6, max_iters=200)
    assert int(loose.iterations) < int(tight.iterations)


def test_cg_preconditioned_fewer_iters():
    n = 128
    A = jnp.asarray(_spd(n, 3, cond=1e4), jnp.float32)
    b = jnp.ones((n, 1), jnp.float32)
    Ainv = jnp.asarray(np.linalg.inv(np.asarray(A)), jnp.float32)
    plain = cg_solve(lambda v: A @ v, b, tol=1e-4, max_iters=500)
    pre = cg_solve(lambda v: A @ v, b, tol=1e-4, max_iters=500, precond=lambda v: Ainv @ v)
    assert int(pre.iterations) < int(plain.iterations)


def test_lanczos_recovers_eigenvalues():
    n = 60
    A = jnp.asarray(_spd(n, 4, cond=50.0), jnp.float32)
    z = jnp.asarray(np.random.default_rng(5).normal(size=(n, 1)), jnp.float32)
    res = lanczos(lambda v: A @ v, z, num_iters=n)
    T = tridiag_matrices(res.alphas, res.betas)[0]
    ritz = np.sort(np.linalg.eigvalsh(np.asarray(T)))
    true = np.sort(np.linalg.eigvalsh(np.asarray(A)))
    np.testing.assert_allclose(ritz[-5:], true[-5:], rtol=1e-2)


def test_slq_logdet_accuracy():
    n, p = 100, 16
    A = jnp.asarray(_spd(n, 6, cond=100.0), jnp.float32)
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.choice([-1.0, 1.0], size=(n, p)), jnp.float32)
    est = float(slq_logdet(lambda v: A @ v, z, num_iters=50))
    true = float(np.linalg.slogdet(np.asarray(A, np.float64))[1])
    assert abs(est - true) / abs(true) < 0.05, (est, true)


def test_pivoted_cholesky_low_rank_recovery():
    # K = L0 L0^T exactly rank 8: pivoted Cholesky with rank 8 must recover it.
    n, k = 50, 8
    rng = np.random.default_rng(8)
    L0 = rng.normal(size=(n, k))
    K = jnp.asarray(L0 @ L0.T, jnp.float32)
    pc = pivoted_cholesky(jnp.diag(K), lambda i: K[:, i], rank=k)
    approx = np.asarray(pc.L) @ np.asarray(pc.L).T
    np.testing.assert_allclose(approx, np.asarray(K), rtol=1e-3, atol=1e-2)


def test_woodbury_solve_and_logdet():
    n, k = 40, 6
    rng = np.random.default_rng(9)
    L = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    noise = jnp.float32(0.5)
    P = np.asarray(L) @ np.asarray(L).T + 0.5 * np.eye(n)
    V = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(woodbury_solve(L, noise, V)), np.linalg.solve(P, np.asarray(V)),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        float(woodbury_logdet(L, noise, n)), np.linalg.slogdet(P)[1], rtol=1e-4
    )
