"""NLML engine vs dense Cholesky ground truth (values and gradients).

The lattice NLML differs from the dense NLML by the filter's MVM error (a few
percent at d=1-2), so comparisons use the tolerance scale of the Snelson
parity test (|delta MLL| < 0.1 per datapoint, reference
tests/train_snelson.py:96), plus gradient direction checks against dense
autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np

from simplex_gp_tpu.linalg import BBMMConfig, lattice_nlml
from simplex_gp_tpu.ops import kernels as K


def _data(n=120, d=1, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2, 2, size=(n, d)).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) + 0.1 * rng.normal(size=n)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def _dense_nlml(params, x, y):
    ref = x * params["inv_ell"]
    d2 = ((ref[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    Khat = params["outputscale"] * jnp.exp(-d2) + params["noise"] * jnp.eye(x.shape[0])
    yc = y - params["mean"]
    L = jnp.linalg.cholesky(Khat)
    alpha = jax.scipy.linalg.cho_solve((L, True), yc[:, None])[:, 0]
    n = y.shape[0]
    return 0.5 * (
        (yc * alpha).sum() + 2 * jnp.log(jnp.diag(L)).sum() + n * jnp.log(2 * jnp.pi)
    ) / n


def _params(d):
    return {
        "inv_ell": jnp.ones((d,), jnp.float32) * 1.5,
        "outputscale": jnp.float32(0.8),
        "noise": jnp.float32(0.1),
        "mean": jnp.float32(0.05),
    }


def _probes(n, p, seed=42):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.choice([-1.0, 1.0], size=(n, p)), jnp.float32)


def test_nlml_value_close_to_dense():
    x, y = _data()
    params = _params(1)
    dk = K.rbf_kernel(2)
    cfg = BBMMConfig(cg_tolerance=1e-3, max_cg_iterations=400, max_lanczos_iterations=80, num_probes=16)
    probes = _probes(x.shape[0], cfg.num_probes)
    ours = float(lattice_nlml(dk, cfg, params, x, y, probes))
    dense = float(_dense_nlml(params, x, y))
    assert abs(ours - dense) < 0.1, (ours, dense)


def test_nlml_gradients_self_consistent_fd():
    # The custom backward must match finite differences of our own forward
    # (with fixed probes and tight CG both estimate the same quantity).  This
    # is the property the reference cannot have for lengthscales (its
    # derivative-coefficient filter approximates the DENSE kernel's gradient,
    # not the applied operator's); our default grad_mode="exact"
    # differentiates through the actual splat/blur/slice pipeline.
    x, y = _data()
    params = _params(1)
    dk = K.rbf_kernel(2)
    cfg = BBMMConfig(cg_tolerance=1e-6, max_cg_iterations=1000, max_lanczos_iterations=100, num_probes=32)
    probes = _probes(x.shape[0], cfg.num_probes)

    g = jax.grad(lambda p: lattice_nlml(dk, cfg, p, x, y, probes))(params)

    def f(p):
        return float(lattice_nlml(dk, cfg, p, x, y, probes))

    eps = 1e-3
    for k in ["inv_ell", "outputscale", "noise", "mean"]:
        p1 = {kk: jnp.array(v) for kk, v in params.items()}
        p2 = {kk: jnp.array(v) for kk, v in params.items()}
        bump = jnp.full_like(params[k], eps)
        p1[k] = params[k] + bump
        p2[k] = params[k] - bump
        fd = (f(p1) - f(p2)) / (2 * eps)
        custom = float(np.asarray(g[k]).sum())
        assert abs(custom - fd) < 0.05 * max(1.0, abs(fd)), f"{k}: custom={custom} fd={fd}"


def test_nlml_noise_mean_grads_match_dense():
    # noise/mean gradients barely involve the filter; they should track the
    # dense model closely.
    x, y = _data()
    params = _params(1)
    dk = K.rbf_kernel(2)
    cfg = BBMMConfig(cg_tolerance=1e-4, max_cg_iterations=400, max_lanczos_iterations=80, num_probes=16)
    probes = _probes(x.shape[0], cfg.num_probes)
    g_ours = jax.grad(lambda p: lattice_nlml(dk, cfg, p, x, y, probes))(params)
    g_dense = jax.grad(lambda p: _dense_nlml(p, x, y))(params)
    for k in ["noise", "mean"]:
        a, b = float(np.asarray(g_ours[k])), float(np.asarray(g_dense[k]))
        assert abs(a - b) < 0.15 * max(1.0, abs(b)), f"{k}: ours={a} dense={b}"


def test_nlml_trainable_end_to_end():
    # 30 Adam-like SGD steps must reduce the NLML.
    x, y = _data(n=100)
    dk = K.rbf_kernel(1)
    cfg = BBMMConfig(cg_tolerance=1e-2, max_cg_iterations=200, max_lanczos_iterations=50, num_probes=8)
    probes = _probes(x.shape[0], cfg.num_probes)

    raw = {
        "log_inv_ell": jnp.zeros((1,), jnp.float32),
        "log_outputscale": jnp.float32(0.0),
        "log_noise": jnp.float32(-1.0),
        "mean": jnp.float32(0.0),
    }

    def unconstrain(raw):
        return {
            "inv_ell": jnp.exp(raw["log_inv_ell"]),
            "outputscale": jnp.exp(raw["log_outputscale"]),
            "noise": jnp.exp(raw["log_noise"]) + 1e-4,
            "mean": raw["mean"],
        }

    loss_fn = jax.jit(lambda r: lattice_nlml(dk, cfg, unconstrain(r), x, y, probes))
    grad_fn = jax.jit(jax.grad(lambda r: lattice_nlml(dk, cfg, unconstrain(r), x, y, probes)))

    first = float(loss_fn(raw))
    lr = 0.05
    for _ in range(30):
        g = grad_fn(raw)
        raw = jax.tree.map(lambda p, gg: p - lr * gg, raw, g)
    last = float(loss_fn(raw))
    assert last < first - 0.05, (first, last)


def test_slq_mode_cg_matches_lanczos_and_dense():
    """The single-pass CG-tridiag log-det engine (slq_mode='cg', the default)
    and the explicit reorthogonalized-Lanczos engine (slq_mode='lanczos')
    must agree with each other and with dense ground truth on the same
    probes -- values and gradient directions."""
    x, y = _data(n=150)
    params = _params(1)
    dk = K.rbf_kernel(2)
    kw = dict(cg_tolerance=1e-4, max_cg_iterations=300, max_lanczos_iterations=60, num_probes=24)
    probes = _probes(x.shape[0], 24)

    vals, grads = {}, {}
    for mode in ("cg", "lanczos"):
        cfg = BBMMConfig(slq_mode=mode, **kw)
        f = lambda p: lattice_nlml(dk, cfg, p, x, y, probes)
        v, g = jax.value_and_grad(f)(params)
        vals[mode], grads[mode] = float(v), g
    dense_v, dense_g = jax.value_and_grad(lambda p: _dense_nlml(p, x, y))(params)

    assert abs(vals["cg"] - vals["lanczos"]) < 0.05, vals
    assert abs(vals["cg"] - float(dense_v)) < 0.1, (vals["cg"], float(dense_v))
    # The two stochastic engines must agree in gradient direction on every
    # parameter (they share probes).  Dense agreement is only asserted for
    # the noise/mean gradients: outputscale/lengthscale grads are small
    # differences of large terms, where the lattice operator's few-percent
    # MVM error moves BOTH engines identically away from dense (the
    # established standard of test_nlml_noise_mean_grads_match_dense).
    for k in ("inv_ell", "outputscale", "noise", "mean"):
        a = np.ravel(np.asarray(grads["cg"][k], np.float64))
        b = np.ravel(np.asarray(grads["lanczos"][k], np.float64))
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.9, (k, cos, a, b)
    for k in ("noise", "mean"):
        a = np.ravel(np.asarray(grads["cg"][k], np.float64))
        b = np.ravel(np.asarray(dense_g[k], np.float64))
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.95, (k, cos, a, b)
    # noise grad is large-magnitude: assert closeness, not just direction.
    assert abs(float(grads["cg"]["noise"]) - float(dense_g["noise"])) / abs(float(dense_g["noise"])) < 0.2
