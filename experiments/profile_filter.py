"""Per-stage lattice-filter profiler: splat / blur / slice / plan-build.

TPU-native equivalent of the reference's compile-time DEBUG tracing, which
prints per-stage (splat/blur/slice) nanosecond timings and hash-table
occupancy (permutohedral.h:268-335, permutohedral_cuda_kernel.cu:548-584,
enabled via ``extra_cflags=['-DDEBUG']`` in experiments/cuda_test.py).

Each stage is timed as an incremental prefix of the real pipeline (stage
time = prefix(k) - prefix(k-1)), so XLA fusion across stage boundaries is
reflected honestly rather than double-counted.  Every prefix is timed with
CHAINED on-device repetitions (utils/timing.py sync_time_chained): R
dependent applications run inside one jitted fori_loop per host sync, so the
~28 ms dispatch floor enters each estimate at 1/R strength -- r2's
floor-subtracted single-shot timings produced NEGATIVE stage times for
stages near the floor; chained prefixes cannot.

Usage:
  python experiments/profile_filter.py [--n 16599] [--d 17] [--order 1]
      [--cols 1] [--reps 10]

Prints one JSON line with per-stage milliseconds.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16599)
    ap.add_argument("--d", type=int, default=17)
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--cols", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8, help="on-device reps per host sync")
    ap.add_argument("--capacity", type=int, default=0,
                    help="chain-table capacity; -1 = measure occupancy and trim, 0 = worst-case bound")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simplex_gp_tpu.ops import kernels as K
    from simplex_gp_tpu.ops.lattice import (
        SLICE_NORM,
        _chain_stencil,
        build_plan_chain,
        count_lattice_points,
        filter_once,
    )
    from simplex_gp_tpu.utils.timing import sync_floor, sync_time_chained, warmup_device

    dk = K.rbf_kernel(args.order)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.n, args.d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(args.n, args.cols)).astype(np.float32))
    taps = [float(t) for t in np.asarray(dk.coeffs)]
    order = args.order
    d = args.d

    cap = None
    if args.capacity == -1:
        occ = int(count_lattice_points(x, dk.variance, dk.coeffs))
        cap = min(-(-int(occ * 1.05) // 8192) * 8192, args.n * (args.d + 1))
    elif args.capacity > 0:
        cap = args.capacity
    plan = build_plan_chain(x, dk.coeffs, dk.variance, capacity=cap)
    jax.block_until_ready(plan.cnt)

    def splat(plan, v):
        n, dp1 = plan.weights.shape
        c = v.shape[-1]
        contrib = (v[:, None, :] * plan.weights[:, :, None]).reshape(n * dp1, c)
        sc = jax.lax.sort(
            (plan.dest,) + tuple(contrib[:, k] for k in range(c)), num_keys=1
        )[1:]
        csum = jnp.cumsum(jnp.stack(sc, axis=-1), axis=0)
        L = jnp.concatenate([jnp.zeros((1, c), jnp.float32), csum], axis=0)[plan.cnt]
        return L - jnp.concatenate([jnp.zeros((1, c), jnp.float32), L[:-1]], axis=0)

    def blur_prefix(plan, v, upto):
        table = splat(plan, v)
        c = v.shape[-1]
        for j in range(upto):
            table = _chain_stencil(table, plan.tapw[j], taps[order], order)
            if j < d:
                o = jax.lax.sort(
                    (plan.k1[j], plan.k2[j]) + tuple(table[:, k] for k in range(c)),
                    num_keys=2,
                )
                table = jnp.stack(o[2:], axis=-1)
        return table

    def full_apply(plan, v):
        table = blur_prefix(plan, v, d + 1)
        gathered = table[plan.slice_idx]
        return (gathered * plan.weights[:, :, None]).sum(axis=1) * SLICE_NORM(d)

    warmup_device()
    floor = sync_floor()

    def chained_v(fn):
        """Per-application seconds of fn(v-like) via dependent on-device reps.

        The carry (a scalar of the previous output) perturbs v by ~1e-9 so
        XLA cannot hoist the body out of the loop; all pipeline stages are
        value-oblivious, so cost is unchanged."""
        def step(i, carry):
            out = fn(v + carry * 1e-9)
            return jnp.ravel(out)[0].astype(jnp.float32)
        return sync_time_chained(
            step, jnp.zeros((), jnp.float32), chain=args.chain, reps=args.reps, floor=floor
        )

    def build_scalar(xx):
        # Touch EVERY plan leaf: returning one field lets XLA dead-code-
        # eliminate the rest of the build (measured 2.3ms vs real 21ms).
        return sum(
            jnp.ravel(leaf)[-1].astype(jnp.float32)
            for leaf in jax.tree.leaves(
                build_plan_chain(xx, dk.coeffs, dk.variance, capacity=cap)
            )
        )

    t_splat = chained_v(lambda vv: splat(plan, vv))
    t_blur = chained_v(lambda vv: blur_prefix(plan, vv, d + 1))
    t_full = chained_v(lambda vv: full_apply(plan, vv))
    t_build = sync_time_chained(
        lambda i, c: build_scalar(x + c * 1e-9),
        jnp.zeros((), jnp.float32),
        chain=args.chain,
        reps=args.reps,
        floor=floor,
    )
    # Perturb X (not v): the fused build depends only on positions, and a
    # loop-constant x would let XLA hoist the whole build out of the chain.
    t_once = sync_time_chained(
        lambda i, c: jnp.ravel(
            filter_once(v, x + c * 1e-9, dk.coeffs, dk.variance, cap)
        )[0],
        jnp.zeros((), jnp.float32),
        chain=args.chain,
        reps=args.reps,
        floor=floor,
    )

    stage = {
        "splat_ms": round(t_splat * 1e3, 3),
        "blur_ms": round(max(t_blur - t_splat, 0.0) * 1e3, 3),
        "slice_ms": round(max(t_full - t_blur, 0.0) * 1e3, 3),
        "apply_total_ms": round(t_full * 1e3, 3),
        "plan_build_ms": round(t_build * 1e3, 3),
        "filter_once_ms": round(t_once * 1e3, 3),
        "per_transition_ms": round(max(t_blur - t_splat, 0.0) / max(d, 1) * 1e3, 4),
        "n_lattice": int(plan.n_lattice),
        "capacity": cap,
        "sync_floor_ms": round(floor * 1e3, 3),
    }
    print(
        json.dumps(
            {
                "n": args.n,
                "d": args.d,
                "order": args.order,
                "cols": args.cols,
                **stage,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
