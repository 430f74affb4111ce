"""Gradient validation for the differentiable lattice filter.

Mirrors the reference's gradient checks (`notebooks/viz_grad.ipynb`): the
filter VJP w.r.t. positions is itself a lattice approximation, so it is
compared against the *analytic* gradient of the dense kernel expression
g^T K(x) s (cosine similarity), not against finite differences of the filter
forward (which would mix discretization errors of two different filters).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplex_gp_tpu.ops import kernels as K
from simplex_gp_tpu.ops.filter import lattice_filter


def _dense_quad(x, s, g, kind):
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    if kind == "rbf":
        Km = jnp.exp(-d2)
    else:
        dd = jnp.sqrt(d2 + 1e-12)
        Km = (1 + jnp.sqrt(3.0) * dd) * jnp.exp(-jnp.sqrt(3.0) * dd)
    return (g * (Km @ s)).sum()


def _cos(a, b):
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    return (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


def test_grad_source_is_symmetric_filter():
    rng = np.random.default_rng(0)
    n, d, L = 60, 2, 3
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(n, L)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, L)).astype(np.float32))
    dk = K.rbf_kernel(1)

    _, vjp = jax.vjp(lambda ss: lattice_filter(ss, x, dk), s)
    (grad_s,) = vjp(g)
    expected = lattice_filter(g, x, dk)
    np.testing.assert_allclose(np.asarray(grad_s), np.asarray(expected), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind,order", [("rbf", 2), ("matern", 3)])
def test_grad_reference_matches_dense_analytic(kind, order):
    rng = np.random.default_rng(3)
    n, d, L = 80, 2, 2
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(n, L)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, L)).astype(np.float32))
    dk = K.rbf_kernel(order) if kind == "rbf" else K.matern_kernel(1.5, order)

    _, vjp = jax.vjp(lambda xx: lattice_filter(s, xx, dk), x)
    (grad_x,) = vjp(g)
    exact = jax.grad(lambda xx: _dense_quad(xx, s, g, kind))(x)
    c = _cos(grad_x, exact)
    assert c > 0.85, f"cosine(grad_lattice, grad_dense) = {c}"
    # The scale must also be in range.  For RBF the derivative kernel equals
    # the forward kernel, so the filter is as accurate as the MVM (±40%).
    # The Matern derivative kernel is exponential (non-smooth at 0) and the
    # discretized filter overestimates it ~1.6x (the reference has the same
    # filter error PLUS a 1.33x constant error from its hardcoded -2, see
    # ops/filter.py docstring), so only a loose scale band holds.
    scale = float((np.asarray(grad_x) * np.asarray(exact)).sum() / (np.asarray(grad_x) ** 2).sum())
    lo, hi = (0.6, 1.67) if kind == "rbf" else (0.25, 2.5)
    assert lo < scale < hi, f"gradient scale mismatch: {scale}"


def test_value_and_grad_through_lengthscale():
    # The chain x/lengthscale -> filter must produce a finite, nonzero
    # lengthscale gradient (this is how ARD training works, reference
    # bilateral_kernel.py:198).
    rng = np.random.default_rng(5)
    n, d = 50, 2
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    dk = K.rbf_kernel(1)

    def loss(log_ell):
        ref = x / jnp.exp(log_ell)
        return (y * lattice_filter(y, ref, dk)).sum()

    g = jax.grad(loss)(jnp.zeros((d,), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.linalg.norm(np.asarray(g)) > 1e-6


def test_wide_chunked_filter_matches_join():
    """The chunked chain-plan wide filter (the very-large-n eval engine)
    must match the join engine on the same (src, ref)."""
    import numpy as np
    from simplex_gp_tpu.ops import kernels as K
    from simplex_gp_tpu.ops.filter import lattice_filter_wide_chunked
    from simplex_gp_tpu.ops.lattice import apply_plan_join, build_plan_join

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(400, 5)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(400, 21)).astype(np.float32))  # non-multiple of chunk
    dk = K.rbf_kernel(1)
    ours = np.asarray(lattice_filter_wide_chunked(v, x, dk))
    jp = build_plan_join(x, dk.coeffs, dk.variance)
    ref = np.asarray(apply_plan_join(jp, v, dk.coeffs))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
