"""SKIP baseline sanity: 1-D KISS limit vs dense GP, trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from simplex_gp_tpu.models import DenseGP
from simplex_gp_tpu.models.ski import SKIP


def _problem(n=100, d=1, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2, 2, size=(n, d)).astype(np.float32)
    y = (np.sin(2 * x[:, 0]) + 0.05 * rng.normal(size=n)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_skip_1d_matches_dense():
    # In 1-D with a fine grid and full rank, KISS-GP approximates the exact
    # GP closely (interpolation error only).
    x, y = _problem()
    skip = SKIP(num_dims=1, grid_size=120, rank=100)
    dense = DenseGP(num_dims=1)
    raw = skip.init_params()
    nl_s = float(skip.nlml(raw, x, y))
    nl_d = float(dense.nlml(dense.init_params(), x, y))
    assert abs(nl_s - nl_d) < 0.05, (nl_s, nl_d)

    xt = jnp.linspace(-1.5, 1.5, 20)[:, None]
    ms, vs = skip.predict(raw, x, y, xt)
    md, vd = dense.predict(dense.init_params(), x, y, xt)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(md), atol=0.05)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), atol=0.05)


def test_skip_product_2d_trains():
    x, y = _problem(n=150, d=2)
    skip = SKIP(num_dims=2, grid_size=40, rank=24)
    raw = skip.init_params()
    loss0 = float(skip.nlml(raw, x, y))
    assert np.isfinite(loss0)
    g = jax.grad(lambda r: skip.nlml(r, x, y))(raw)
    raw2 = jax.tree.map(lambda p, gg: p - 0.1 * gg, raw, g)
    assert float(skip.nlml(raw2, x, y)) < loss0
