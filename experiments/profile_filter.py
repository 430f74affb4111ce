"""Per-stage lattice-filter profiler: splat / blur / slice / plan-build.

TPU-native equivalent of the reference's compile-time DEBUG tracing, which
prints per-stage (splat/blur/slice) nanosecond timings and hash-table
occupancy (permutohedral.h:268-335, permutohedral_cuda_kernel.cu:548-584,
enabled via ``extra_cflags=['-DDEBUG']`` in experiments/cuda_test.py).

Each stage is timed as an incremental prefix of the real pipeline (stage
time = prefix(k) - prefix(k-1)), so XLA fusion across stage boundaries is
reflected honestly rather than double-counted.  All timings are
device-synced (utils/timing.py) with the dispatch floor subtracted.

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
    ap.add_argument("--reps", type=int, default=10)
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
    from simplex_gp_tpu.utils.timing import sync_floor, sync_time

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

    floor = sync_floor()
    stage = {}
    j_splat = jax.jit(splat)
    j_blur = jax.jit(lambda p, vv: blur_prefix(p, vv, d + 1))
    j_full = jax.jit(full_apply)
    # Return a scalar touching EVERY plan leaf: returning one field lets XLA
    # dead-code-eliminate the rest of the build (measured 2.3ms vs real 21ms).
    j_build = jax.jit(
        lambda xx: sum(
            jnp.ravel(leaf)[-1].astype(jnp.float32)
            for leaf in jax.tree.leaves(
                build_plan_chain(xx, dk.coeffs, dk.variance, capacity=cap)
            )
        )
    )
    j_once = jax.jit(lambda vv, xx: filter_once(vv, xx, dk.coeffs, dk.variance, cap))

    t_splat = max(sync_time(j_splat, plan, v, reps=args.reps) - floor, 0.0)
    t_blur = max(sync_time(j_blur, plan, v, reps=args.reps) - floor, 0.0)
    t_full = max(sync_time(j_full, plan, v, reps=args.reps) - floor, 0.0)
    t_build = max(sync_time(j_build, x, reps=args.reps) - floor, 0.0)
    t_once = max(sync_time(j_once, v, x, reps=args.reps) - floor, 0.0)

    stage = {
        "splat_ms": round(t_splat * 1e3, 3),
        "blur_ms": round((t_blur - t_splat) * 1e3, 3),
        "slice_ms": round((t_full - t_blur) * 1e3, 3),
        "apply_total_ms": round(t_full * 1e3, 3),
        "plan_build_ms": round(t_build * 1e3, 3),
        "filter_once_ms": round(t_once * 1e3, 3),
        "per_transition_ms": round((t_blur - t_splat) / max(d, 1) * 1e3, 4),
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
