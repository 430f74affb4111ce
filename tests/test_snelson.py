"""End-to-end Snelson 1-D parity test -- the canonical verification.

TPU-native mirror of the reference's `tests/train_snelson.py` (documented as
THE verification at README.md:97-105): train a Simplex-GP (RBF lattice,
order=1) and a dense exact GP for 100 Adam epochs at lr=0.1 on the raw
Snelson data and assert the final train MLLs agree within 0.1
(train_snelson.py:96).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplex_gp_tpu import BBMMConfig, DenseGP, SimplexGP
from simplex_gp_tpu.utils import fit_adam, load_snelson


@pytest.fixture(scope="module")
def snelson():
    x, y = load_snelson()
    return jnp.asarray(x), jnp.asarray(y)


def test_snelson_mll_parity(snelson):
    x, y = snelson

    simplex = SimplexGP(
        num_dims=1,
        kernel="rbf",
        order=1,
        min_noise=1e-4,
        bbmm=BBMMConfig(
            cg_tolerance=1e-4,
            max_cg_iterations=500,
            max_lanczos_iterations=100,
            num_probes=10,
        ),
    )
    raw_s, hist_s = fit_adam(
        lambda raw, key: simplex.nlml(raw, x, y, key),
        simplex.init_params(),
        epochs=100,
        lr=0.1,
    )

    dense = DenseGP(num_dims=1, kernel="rbf", min_noise=1e-4)
    raw_d, hist_d = fit_adam(
        lambda raw, key: dense.nlml(raw, x, y, key),
        dense.init_params(),
        epochs=100,
        lr=0.1,
    )

    # Final train MLL (positive, per datapoint), evaluated with a fresh key.
    key = jax.random.PRNGKey(123)
    mll_simplex = -float(simplex.nlml(raw_s, x, y, key))
    mll_dense = -float(dense.nlml(raw_d, x, y))
    delta = abs(mll_simplex - mll_dense)
    assert delta < 0.1, f"Simplex MLL {mll_simplex:.4f} vs dense {mll_dense:.4f} (delta {delta:.4f})"


def test_snelson_prediction_quality(snelson):
    # Posterior predictions on held-out points: train on even indices,
    # predict odd; lattice predictions should track the dense exact GP.
    x, y = snelson
    xt, yt = x[::2], y[::2]
    xe, ye = x[1::2], y[1::2]

    simplex = SimplexGP(num_dims=1, kernel="rbf", order=1, min_noise=1e-4,
                        bbmm=BBMMConfig(cg_tolerance=1e-4, max_lanczos_iterations=100))
    raw, _ = fit_adam(lambda r, k: simplex.nlml(r, xt, yt, k), simplex.init_params(), epochs=60, lr=0.1)
    mean, var = simplex.predict(raw, xt, yt, xe, jax.random.PRNGKey(0))

    rmse = float(jnp.sqrt(((mean - ye) ** 2).mean()))
    assert rmse < 0.35, f"Snelson held-out RMSE {rmse}"
    assert np.all(np.asarray(var) > 0)
    # Calibration sanity: most held-out residuals within 3 sigma.
    z = np.abs(np.asarray(mean - ye)) / np.sqrt(np.asarray(var))
    assert (z < 3).mean() > 0.9
