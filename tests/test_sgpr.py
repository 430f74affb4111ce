"""SGPR (Titsias collapsed bound) sanity: exact-GP limit and training."""

import jax
import jax.numpy as jnp
import numpy as np

from simplex_gp_tpu.models import DenseGP
from simplex_gp_tpu.models.sgpr import SGPR


def _problem(n=80, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.5 * x[:, 1] + 0.05 * rng.normal(size=n)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_sgpr_exact_limit():
    # With inducing = all training inputs, the collapsed bound equals the
    # exact NLML and predictions match the dense GP.
    x, y = _problem()
    sgpr = SGPR(num_dims=2, num_inducing=x.shape[0])
    dense = DenseGP(num_dims=2)
    raw_s = sgpr.init_params(x)
    raw_s["inducing"] = x  # all points
    raw_d = dense.init_params()

    nl_s = float(sgpr.nlml(raw_s, x, y))
    nl_d = float(dense.nlml(raw_d, x, y))
    assert abs(nl_s - nl_d) < 0.02, (nl_s, nl_d)

    xt = x[:10] + 0.1
    ms, vs = sgpr.predict(raw_s, x, y, xt)
    md, vd = dense.predict(raw_d, x, y, xt)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(md), atol=0.02)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vd), atol=0.02)


def test_sgpr_trains():
    x, y = _problem(n=120)
    sgpr = SGPR(num_dims=2, num_inducing=20)
    raw = sgpr.init_params(x)
    loss0 = float(sgpr.nlml(raw, x, y))
    g = jax.grad(lambda r: sgpr.nlml(r, x, y))(raw)
    raw2 = jax.tree.map(lambda p, gg: p - 0.1 * gg, raw, g)
    assert float(sgpr.nlml(raw2, x, y)) < loss0
