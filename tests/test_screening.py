"""ARD dimension screening for lattice inference (SimplexGP.prune_thresh).

New capability over the reference (rationale: analysis/QUALITY_GAP.md --
every embedded dim degrades the permutohedral approximation, while dims
with near-zero trained inverse lengthscale contribute nothing to the exact
kernel).  Pins: (a) the kept-dims selection, (b) screened-cache prediction
equals the manually dimension-subset model, (c) prune_thresh=0 is the plain
path, (d) the `_sparse` synthetic variant has anisotropic relevance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from simplex_gp_tpu import BBMMConfig, SimplexGP
from simplex_gp_tpu.utils.data import UCI_SHAPES, load_uci


def _model(d, thresh):
    return SimplexGP(
        num_dims=d, kernel="rbf", order=1, min_noise=1e-4, prune_thresh=thresh,
        bbmm=BBMMConfig(max_cg_iterations=100, max_lanczos_iterations=30,
                        precond_rank=0, num_probes=4),
    )


def _data(n=220, d=5, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0] * 2.0) + 0.1 * rng.normal(size=n)).astype(jnp.float32)
    return x, y


def test_screened_selection_and_equivalence_to_manual_subset():
    d = 5
    model = _model(d, thresh=0.1)
    raw = model.init_params()
    # Dims 3, 4 irrelevant: huge raw lengthscale -> tiny inverse lengthscale.
    rl = np.asarray(raw["raw_lengthscale"], np.float32).copy()
    rl[3:] = 60.0
    raw = dict(raw, raw_lengthscale=jnp.asarray(rl))

    sub, raw_sub, keep = model.screened(raw)
    assert list(keep) == [0, 1, 2]
    assert sub.num_dims == 3 and sub.prune_thresh == 0.0

    x, y = _data(d=d)
    key = jax.random.PRNGKey(0)
    cache = model.posterior_cache_screened(raw, x, y, key)
    xt = x[:32] + 0.05
    m1, v1 = model.predict_from_cache_screened(cache, x, xt)

    # Manual subset: same sub-model driven by hand.
    cache2 = sub.posterior_cache(raw_sub, x[:, :3], y, key)
    m2, v2 = sub.predict_from_cache(cache2, x[:, :3], xt[:, :3])
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-6)


def test_prune_thresh_zero_is_plain_path():
    d = 4
    model = _model(d, thresh=0.0)
    raw = model.init_params()
    x, y = _data(d=d)
    key = jax.random.PRNGKey(1)
    sub, raw_sub, keep = model.screened(raw)
    assert keep is None and sub is model
    cache = model.posterior_cache_screened(raw, x, y, key)
    xt = x[:16]
    m1, v1 = model.predict_from_cache_screened(cache, x, xt)
    plain = model.posterior_cache(raw, x, y, key)
    m2, v2 = model.predict_from_cache(plain, x, xt)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_sparse_synthetic_variant_is_anisotropic():
    n, d = UCI_SHAPES["protein"]
    data = load_uci("protein_sparse")
    assert data.shape == (n, d + 1)
    x, y = data[:, :-1], data[:, -1]
    # The target depends on <= 4 input dims: correlation of |y| gradient
    # proxy -- per-dim linear correlation of y with x should be (near) zero
    # for most dims and clearly nonzero for at most 4.
    c = np.abs([np.corrcoef(x[:, j], y)[0, 1] for j in range(d)])
    strong = (c > 5 * np.median(c)).sum()
    assert 1 <= strong <= 4, c
    # And it differs from the clustered variant's target.
    data_c = load_uci("protein_clustered")
    assert not np.allclose(data[:, -1], data_c[:, -1])
