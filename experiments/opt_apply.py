"""Candidate formulations for the multi-rhs chain apply (VERDICT r5 perf).

The r3->r4 vertex-major layout change kept single-rhs apply speed but
regressed the 8-rhs apply 34-67% (runs/r5/ab_lattice.jsonl): the packed
(M, c) splat-cumsum/stencils became c separate 1-D passes.  This experiment
times variants of the apply at the bench geometry to pick a formulation:

  base    -- apply_plan_chain as committed (tuple-of-1-D columns).
  packed  -- (c, M) arrays with the HUGE axis minor (no lane padding, c pads
             only to 8 sublanes): packed cumsum/stencil/boundary-diff; sorts
             still per-column (lax.sort operands must match key shape).
  padslice -- like base but the shift stencil reads static slices of one
             padded array instead of building concatenated temps.
  gather  -- NO sorts in the apply at all: the splat and transition
             permutations are plan-constants (dest resp. (k1, k2) do not
             depend on v), so they are precomputed once as argsorts and the
             apply replays them as (c, M) gathers.

Each variant is verified against the committed apply before timing.

Usage: python experiments/opt_apply.py [--n 16599 --d 17 --cols 1,8,16]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simplex_gp_tpu.ops import kernels as K  # noqa: E402
from simplex_gp_tpu.ops.lattice import (  # noqa: E402
    SLICE_NORM,
    apply_plan_chain,
    build_plan_chain,
)
from simplex_gp_tpu.utils.timing import (  # noqa: E402
    sync_floor,
    sync_time_chained,
    warmup_device,
    with_retries,
)


def _plan_dims(plan):
    dp1 = plan.tapw.shape[0]
    Mct = plan.weights.shape[0]
    return dp1, dp1 - 1, Mct, Mct // dp1, plan.cnt.shape[0], plan.tapw.shape[1]


def apply_packed(plan, v, coeffs):
    dp1, d, Mct, n, M, order = _plan_dims(plan)
    taps = [float(t) for t in np.asarray(coeffs)]
    v = v.astype(jnp.float32)
    c = v.shape[-1]
    W2 = plan.weights.reshape(dp1, n)
    contrib = (W2[None] * v.T[:, None, :]).reshape(c, Mct)
    sc = jax.lax.sort((plan.dest,) + tuple(contrib[k] for k in range(c)), num_keys=1)[1:]
    S = jnp.stack(sc, 0)  # (c, Mct)
    Z = jnp.zeros((c, 1), jnp.float32)
    Lk = jnp.concatenate([Z, jnp.cumsum(S, axis=1)], axis=1)[:, plan.cnt]
    table = Lk - jnp.concatenate([Z, Lk[:, :-1]], axis=1)  # (c, M)
    for j in range(dp1):
        tapw_j = plan.tapw[j]
        acc = taps[order] * table
        for k in range(1, order + 1):
            w = tapw_j[k - 1][None, :]
            zk = jnp.zeros((c, k), jnp.float32)
            acc = (
                acc
                + w * jnp.concatenate([table[:, k:], zk], 1)
                + jnp.concatenate([zk, (w * table)[:, :-k]], 1)
            )
        table = acc
        if j < d:
            o = jax.lax.sort(
                (plan.k1[j], plan.k2[j]) + tuple(table[k] for k in range(c)), num_keys=2
            )
            table = jnp.stack(o[2:], 0)
    gathered = table[:, plan.slice_idx] * plan.weights[None, :]  # (c, Mct)
    out = gathered.reshape(c, dp1, n).sum(1).T
    return jnp.where(plan.n_lattice <= M, out * SLICE_NORM(d), jnp.float32(jnp.nan))


def _stencil_padslice(t, tapw_j, center, order):
    M = t.shape[0]
    tp = jnp.pad(t, (order, order))
    acc = center * t
    for k in range(1, order + 1):
        w = tapw_j[k - 1]
        wt = jnp.pad(w * t, (order, order))
        acc = acc + w * tp[order + k : order + k + M] + wt[order - k : order - k + M]
    return acc


def apply_padslice(plan, v, coeffs):
    dp1, d, Mct, n, M, order = _plan_dims(plan)
    taps = [float(t) for t in np.asarray(coeffs)]
    v = v.astype(jnp.float32)
    c_in = v.shape[-1]
    W2 = plan.weights.reshape(dp1, n)
    contrib_cols = tuple((W2 * v[:, k][None, :]).reshape(Mct) for k in range(c_in))
    sc = jax.lax.sort((plan.dest,) + contrib_cols, num_keys=1)[1:]
    zero1 = jnp.zeros((1,), jnp.float32)
    tcols = []
    for s in sc:
        Lk = jnp.concatenate([zero1, jnp.cumsum(s)])[plan.cnt]
        tcols.append(Lk - jnp.concatenate([zero1, Lk[:-1]]))
    tcols = tuple(tcols)
    for j in range(dp1):
        tapw_j = plan.tapw[j]
        tcols = tuple(_stencil_padslice(t, tapw_j, taps[order], order) for t in tcols)
        if j < d:
            o = jax.lax.sort((plan.k1[j], plan.k2[j]) + tcols, num_keys=2)
            tcols = o[2:]
    tableT = jnp.stack(tcols, axis=0)
    gathered = tableT[:, plan.slice_idx] * plan.weights[None, :]
    out = gathered.reshape(c_in, dp1, n).sum(1).T
    return jnp.where(plan.n_lattice <= M, out * SLICE_NORM(d), jnp.float32(jnp.nan))


def make_perms(plan):
    """Plan-constant permutations for the splat routing and transitions."""
    dp1, d, Mct, n, M, order = _plan_dims(plan)
    dest = np.asarray(plan.dest)
    splat_perm = np.argsort(dest, kind="stable").astype(np.int32)
    trans = []
    for j in range(d):
        k1 = np.asarray(plan.k1[j]).astype(np.int64)
        k2 = np.asarray(plan.k2[j]).astype(np.int64)
        key = (k1 << 32) | (k2 & 0xFFFFFFFF)
        trans.append(np.argsort(key, kind="stable").astype(np.int32))
    return jnp.asarray(splat_perm), [jnp.asarray(t) for t in trans]


def apply_gather(plan, perms, v, coeffs):
    splat_perm, trans = perms
    dp1, d, Mct, n, M, order = _plan_dims(plan)
    taps = [float(t) for t in np.asarray(coeffs)]
    v = v.astype(jnp.float32)
    c = v.shape[-1]
    W2 = plan.weights.reshape(dp1, n)
    contrib = (W2[None] * v.T[:, None, :]).reshape(c, Mct)
    S = contrib[:, splat_perm]  # replay the dest sort as one packed gather
    Z = jnp.zeros((c, 1), jnp.float32)
    Lk = jnp.concatenate([Z, jnp.cumsum(S, axis=1)], axis=1)[:, plan.cnt]
    table = Lk - jnp.concatenate([Z, Lk[:, :-1]], axis=1)
    for j in range(dp1):
        tapw_j = plan.tapw[j]
        acc = taps[order] * table
        for k in range(1, order + 1):
            w = tapw_j[k - 1][None, :]
            zk = jnp.zeros((c, k), jnp.float32)
            acc = (
                acc
                + w * jnp.concatenate([table[:, k:], zk], 1)
                + jnp.concatenate([zk, (w * table)[:, :-k]], 1)
            )
        if j < d:
            table = acc[:, trans[j]]
        else:
            table = acc
    gathered = table[:, plan.slice_idx] * plan.weights[None, :]
    out = gathered.reshape(c, dp1, n).sum(1).T
    return jnp.where(plan.n_lattice <= M, out * SLICE_NORM(d), jnp.float32(jnp.nan))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=16599)
    p.add_argument("--d", type=int, default=17)
    p.add_argument("--cols", default="1,8,16")
    p.add_argument("--out", default="runs/r5/opt_apply.jsonl")
    args = p.parse_args()

    dk = K.rbf_kernel(1)
    rng = np.random.default_rng(0)
    out_path = pathlib.Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out = open(out_path, "a")

    def emit(rec):
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()

    warm = with_retries(lambda: warmup_device(), what="warmup")
    floor = with_retries(lambda: sync_floor(), what="floor")
    emit({"phase": "session", "device": str(jax.devices()[0]),
          "warmup_s": round(warm, 1), "floor_ms": round(floor * 1e3, 3),
          "n": args.n, "d": args.d})

    # Correctness at a small geometry first.
    xs = jnp.asarray(rng.normal(size=(512, 4)).astype(np.float32))
    plan_s = build_plan_chain(xs, dk.coeffs, dk.variance)
    perms_s = make_perms(plan_s)
    vs = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    ref_out = np.asarray(apply_plan_chain(plan_s, vs, dk.coeffs))
    for name, fn in [
        ("packed", lambda: apply_packed(plan_s, vs, dk.coeffs)),
        ("padslice", lambda: apply_padslice(plan_s, vs, dk.coeffs)),
        ("gather", lambda: apply_gather(plan_s, perms_s, vs, dk.coeffs)),
    ]:
        got = np.asarray(fn())
        err = float(np.abs(got - ref_out).max() / (np.abs(ref_out).max() + 1e-30))
        emit({"check": name, "max_rel_err": err})
        assert err < 1e-5, (name, err)

    x = jnp.asarray(rng.normal(size=(args.n, args.d)).astype(np.float32))
    plan = build_plan_chain(x, dk.coeffs, dk.variance)
    perms = make_perms(plan)

    def renorm(t):
        return t / jnp.maximum(jnp.abs(t).max(), 1e-30)

    for c in [int(s) for s in args.cols.split(",")]:
        v = jnp.asarray(rng.normal(size=(args.n, c)).astype(np.float32))
        variants = {
            "base": lambda i, cr: renorm(apply_plan_chain(plan, cr, dk.coeffs)),
            "packed": lambda i, cr: renorm(apply_packed(plan, cr, dk.coeffs)),
            "padslice": lambda i, cr: renorm(apply_padslice(plan, cr, dk.coeffs)),
            "gather": lambda i, cr: renorm(apply_gather(plan, perms, cr, dk.coeffs)),
        }
        rec = {"cols": c}
        for name, step in variants.items():
            t = with_retries(
                lambda step=step: sync_time_chained(step, v, chain=8, reps=5, floor=floor),
                what=f"{name}/c{c}",
            )
            rec[f"{name}_ms"] = round(t * 1e3, 3)
        emit(rec)
    out.close()


if __name__ == "__main__":
    main()
