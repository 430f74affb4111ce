"""Multi-device data-parallel tests on the 8-virtual-CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np

from simplex_gp_tpu import BBMMConfig, SimplexGP
from simplex_gp_tpu.parallel import data_parallel_loss_fn, make_mesh, replicate, shard_batch


def _problem(n=96, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)).astype(np.float32)
    return x, y


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_sharded_loss_matches_single_device():
    x, y = _problem()
    model = SimplexGP(
        num_dims=2, kernel="rbf", order=1,
        bbmm=BBMMConfig(cg_tolerance=1e-4, max_cg_iterations=200,
                        max_lanczos_iterations=40, num_probes=8),
    )
    raw = model.init_params()
    key = jax.random.PRNGKey(0)

    # Single-device reference.
    loss1, grads1 = jax.value_and_grad(lambda r: model.nlml(r, jnp.asarray(x), jnp.asarray(y), key))(raw)

    mesh = make_mesh()
    fn = data_parallel_loss_fn(model, mesh)
    xs, ys = shard_batch(mesh, x, y)
    raw_r = replicate(mesh, raw)
    loss8, grads8 = fn(raw_r, xs, ys, key)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-3, atol=1e-3)
    for k in grads1:
        np.testing.assert_allclose(
            np.asarray(grads1[k]), np.asarray(grads8[k]), rtol=2e-2, atol=2e-3
        )


def test_shard_batch_truncates_to_mesh_multiple():
    mesh = make_mesh()
    x = np.ones((10, 3), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.shape[0] == 8  # remainder rows dropped, never zero-padded
