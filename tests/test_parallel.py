"""Multi-device data-parallel tests on the 8-virtual-CPU mesh (conftest).

The reference has no distributed mode (SURVEY.md section 2.7); these tests
pin down the new capability: the explicit shard_map data-sharded filter and
BBMM engine must reproduce the single-device computation exactly (same
probes), and the training wrapper must produce consistent losses/grads.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from simplex_gp_tpu import BBMMConfig, SimplexGP
from simplex_gp_tpu.linalg.mll import lattice_inv_quad_logdet
from simplex_gp_tpu.ops.lattice import apply_plan, build_plan
from simplex_gp_tpu.parallel import (
    build_plan_sharded,
    data_parallel_loss_fn,
    make_mesh,
    replicate,
    shard_batch,
)


def _problem(n=96, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)).astype(np.float32)
    return x, y


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_sharded_filter_matches_single_device():
    """Per-shard splat + psum'd global lattice == single-device filter."""
    from simplex_gp_tpu.ops.kernels import rbf_kernel

    dk = rbf_kernel(1)
    x, _ = _problem(n=64, d=3)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(64, 2)).astype(np.float32)

    plan = build_plan(jnp.asarray(x), dk.coeffs, dk.variance)
    ref = np.asarray(apply_plan(plan, jnp.asarray(v), dk.coeffs))

    mesh = make_mesh()

    def shard_fn(x_loc, v_loc):
        p = build_plan_sharded(x_loc, dk.coeffs, dk.variance, "data")
        return apply_plan(p, v_loc, dk.coeffs, axis_name="data")

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data", None), P("data", None)),
        out_specs=P("data", None),
        check_vma=False,
    )(jnp.asarray(x), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_sharded_chain_matches_sharded_join():
    """The two sharded engines (sort-chain vs gather-join) agree on the same
    shards, probes-free, at float precision."""
    from simplex_gp_tpu.ops.kernels import matern_kernel
    from simplex_gp_tpu.parallel import build_plan_sharded_join

    dk = matern_kernel(1.5, 2)
    x, _ = _problem(n=64, d=4, seed=5)
    rng = np.random.default_rng(6)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    mesh = make_mesh()

    def run(builder):
        def shard_fn(x_loc, v_loc):
            p = builder(x_loc, dk.coeffs, dk.variance, "data")
            return apply_plan(p, v_loc, dk.coeffs, axis_name="data")

        return np.asarray(
            shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P("data", None), P("data", None)),
                out_specs=P("data", None),
                check_vma=False,
            )(jnp.asarray(x), jnp.asarray(v))
        )

    out_chain = run(build_plan_sharded)
    out_join = run(build_plan_sharded_join)
    np.testing.assert_allclose(out_chain, out_join, rtol=1e-4, atol=1e-5)


def test_sharded_engine_matches_single_device_same_probes():
    """inv_quad/logdet and parameter grads: shard_map == single device,
    bit-for-bit up to f32 reduction ordering, when probes are shared."""
    x, y = _problem()
    n = x.shape[0]
    model = SimplexGP(
        num_dims=2, kernel="rbf", order=1,
        bbmm=BBMMConfig(cg_tolerance=1e-4, max_cg_iterations=200,
                        max_lanczos_iterations=40, num_probes=8),
    )
    raw = model.init_params()
    probes = np.asarray(
        jax.random.rademacher(jax.random.PRNGKey(7), (n, 8), dtype=jnp.float32)
    )

    def single_loss(r):
        params = model.constrained(r)
        iq, ld = lattice_inv_quad_logdet(
            model.dk, model.bbmm, params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(probes)
        )
        return iq + ld

    loss1, grads1 = jax.value_and_grad(single_loss)(raw)

    mesh = make_mesh()
    cfg = dataclasses.replace(model.bbmm, axis_name="data")

    def shard_loss_fn(r, x_loc, y_loc, z_loc):
        def inner(rr):
            params = model.constrained(rr)
            iq, ld = lattice_inv_quad_logdet(model.dk, cfg, params, x_loc, y_loc, z_loc)
            return iq + ld

        loss, grads = jax.value_and_grad(inner)(r)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "data"), grads)
        return loss, grads

    loss8, grads8 = shard_map(
        shard_loss_fn,
        mesh=mesh,
        in_specs=(P(), P("data", None), P("data"), P("data", None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(raw, jnp.asarray(x), jnp.asarray(y), jnp.asarray(probes))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4, atol=1e-4)
    for k in grads1:
        np.testing.assert_allclose(
            np.asarray(grads1[k]), np.asarray(grads8[k]), rtol=1e-3, atol=1e-4
        )


def test_data_parallel_loss_fn_end_to_end():
    """Training wrapper: finite loss, finite psum'd grads, loss in family
    with the single-device value (probes differ per shard by design, so the
    SLQ log-det term only agrees stochastically)."""
    x, y = _problem()
    model = SimplexGP(
        num_dims=2, kernel="rbf", order=1,
        bbmm=BBMMConfig(cg_tolerance=1e-4, max_cg_iterations=200,
                        max_lanczos_iterations=40, num_probes=8),
    )
    raw = model.init_params()
    key = jax.random.PRNGKey(0)

    loss1, _ = jax.value_and_grad(
        lambda r: model.nlml(r, jnp.asarray(x), jnp.asarray(y), key)
    )(raw)

    mesh = make_mesh()
    fn = data_parallel_loss_fn(model, mesh)
    xs, ys = shard_batch(mesh, x, y)
    raw_r = replicate(mesh, raw)
    loss8, grads8 = fn(raw_r, xs, ys, key)

    assert np.isfinite(float(loss8))
    for k in grads8:
        assert np.all(np.isfinite(np.asarray(grads8[k])))
    # SLQ probe noise: the two losses agree to the trace-estimator scatter.
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=0.25, atol=0.25)


def test_gspmd_loss_fn_matches_single_device():
    """GSPMD cross-check (VERDICT r3 item 8): jitting the SINGLE-DEVICE nlml
    with sharded inputs is the same traced program, just partitioned by XLA's
    SPMD pass -- loss and grads must match the unsharded run to f32 reduction
    tolerance (same key => same probes, unlike the shard_map wrapper which
    folds the key per shard)."""
    from simplex_gp_tpu.parallel import gspmd_loss_fn

    x, y = _problem()
    model = SimplexGP(
        num_dims=2, kernel="rbf", order=1,
        bbmm=BBMMConfig(cg_tolerance=1e-4, max_cg_iterations=200,
                        max_lanczos_iterations=40, num_probes=8),
    )
    raw = model.init_params()
    key = jax.random.PRNGKey(3)

    loss1, grads1 = jax.value_and_grad(
        lambda r: model.nlml(r, jnp.asarray(x), jnp.asarray(y), key)
    )(raw)

    mesh = make_mesh()
    fn = gspmd_loss_fn(model, mesh)
    xs, ys = shard_batch(mesh, x, y)
    loss8, grads8 = fn(replicate(mesh, raw), xs, ys, key)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4, atol=1e-4)
    for k in grads1:
        np.testing.assert_allclose(
            np.asarray(grads1[k]), np.asarray(grads8[k]), rtol=1e-3, atol=1e-4
        )


def test_shard_batch_truncates_to_mesh_multiple():
    mesh = make_mesh()
    x = np.ones((10, 3), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.shape[0] == 8  # remainder rows dropped, never zero-padded
