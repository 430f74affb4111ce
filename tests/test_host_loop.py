"""Host-orchestrated BBMM engine (linalg/host_loop.py) vs the fused engine.

The host loop exists because the fused while-loop NLML graph exceeds what
the TPU compile stack reliably handles at houseelectric scale; numerically
it must be the SAME algorithm (CG-tridiag SLQ, mean stopping, closed-form
backward), so values and gradients are pinned against the jitted engine on
shared probes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from simplex_gp_tpu import BBMMConfig, SimplexGP


def _setup(n=300, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y = jnp.asarray(np.sin(np.asarray(x).sum(-1)) + 0.1 * rng.normal(size=n)).astype(jnp.float32)
    model = SimplexGP(
        num_dims=d, kernel="matern", nu=1.5, order=1, min_noise=1e-4,
        bbmm=BBMMConfig(cg_tolerance=1e-3, max_cg_iterations=200,
                        max_lanczos_iterations=50, precond_rank=20, num_probes=8),
    )
    return model, x, y


def test_host_loop_nlml_matches_fused_engine():
    model, x, y = _setup()
    raw = model.init_params()
    key = jax.random.PRNGKey(3)

    v_fused, g_fused = jax.value_and_grad(lambda r: model.nlml(r, x, y, key))(raw)
    v_host, g_host = model.nlml_value_and_grad_host(raw, x, y, key)

    assert abs(float(v_fused) - float(v_host)) < 2e-3, (float(v_fused), v_host)
    for k in raw:
        a = np.ravel(np.asarray(g_fused[k], np.float64))
        b = np.ravel(np.asarray(g_host[k], np.float64))
        np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-4, err_msg=k)


def test_host_posterior_cache_matches_jitted():
    model, x, y = _setup(n=250)
    raw = model.init_params()
    key = jax.random.PRNGKey(11)
    c1 = model.posterior_cache(raw, x, y, key)
    c2 = model.posterior_cache_host(raw, x, y, key)
    np.testing.assert_allclose(np.asarray(c2["alpha"]), np.asarray(c1["alpha"]), rtol=1e-2, atol=1e-3)
    xt = x[:64] + 0.05
    m1, v1 = model.predict_from_cache(c1, x, xt)
    m2, v2 = model.predict_from_cache(c2, x, xt)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=5e-2, atol=1e-3)
