"""Stage-level plan-BUILD profiling on device (chained timing, no negative times).

Breaks ``build_plan_chain`` into its constituent device passes and times each
with :func:`sync_time_chained` (R dependent on-device reps per host sync, so
the ~28 ms dispatch floor enters at 1/R strength and no stage can go
negative).  Complements experiments/profile_filter.py (which profiles the
APPLY path); together they replace the reference's compile-time DEBUG
per-stage timers (cpp/permutohedral.h:268-335).

Usage:
  python experiments/profile_build.py [--datasets precipitation keggdirected]
      [--order 1] [--chain 8]

Prints one JSON line per dataset with per-stage ms.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

SHAPES = {
    "elevators": (16599, 17),
    "protein": (45730, 9),
    "keggdirected": (48827, 20),
    "precipitation": (628474, 3),
    "houseelectric": (2049280, 11),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=["precipitation", "keggdirected", "protein"])
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simplex_gp_tpu.ops import kernels as K
    from simplex_gp_tpu.ops import lattice as L
    from simplex_gp_tpu.utils.timing import sync_floor, sync_time_chained, warmup_device

    warmup_device()
    floor = sync_floor()
    dk = K.rbf_kernel(args.order)
    order = args.order
    cs = np.asarray(dk.coeffs, np.float64)

    for name in args.datasets:
        n, d = SHAPES[name]
        x = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)).astype(np.float32))
        E = jnp.asarray(L.build_rotation(d, dk.variance))
        a = L._hash_vectors(d)
        M = n * (d + 1)

        # Materialize each stage's inputs once.
        h1, h2, s, weights = jax.jit(lambda xx: L._geometry_hs(xx, E, a))(x)
        occupied = int(L.count_lattice_points(x, dk.variance, dk.coeffs))
        cap = -(-int(occupied * 1.05) // 8192) * 8192
        capacity = cap if cap < 0.9 * M else None
        Mc = capacity if capacity is not None else M

        iota = jnp.arange(M, dtype=jnp.int32)

        def stage_geometry(i, c):
            # Carry a REAL output value into the next iteration's input:
            # nothing here is foldable, and geometry cost is data-oblivious,
            # so wandering values time the same program.
            h1_, h2_, s_, w_ = L._geometry_hs(x + c * 1e-9, E, a)
            return w_[0, 0] + s_[0].astype(jnp.float32)

        def _sort1(h1q, h2q, sq):
            c1_0, c2_0 = L._chain_words(h1q, h2q, sq, np.array([0]), d)
            k0 = L._pack(c2_0[0], sq)
            return jax.lax.sort((c1_0[0], k0, iota, h2q), num_keys=2)

        C1, K0, I, H2 = jax.jit(_sort1)(h1, h2, s)

        def stage_sort1(i, c):
            out = _sort1(h1 + c, h2, s)  # sort is data-oblivious: cost unchanged
            return out[0][0] + out[3][0]

        newgrp = jnp.concatenate(
            [jnp.ones((1,), bool), (C1[1:] != C1[:-1]) | (K0[1:] != K0[:-1]) | (H2[1:] != H2[:-1])]
        )
        seg_sorted = (jnp.cumsum(newgrp) - 1).astype(jnp.int32)

        def stage_sort2(i, c):
            _, dest, seg_orig = jax.lax.sort((I + c, iota, seg_sorted), num_keys=1)
            return dest[0] + seg_orig[0]

        def stage_sort3(i, c):
            _, u_pos, u_c1, u_h2, u_k0 = jax.lax.sort(
                (jnp.where(newgrp, seg_sorted, M + iota) + c, iota, C1, H2, K0),
                num_keys=1,
            )
            return u_pos[0] + u_c1[0] + u_h2[0] + u_k0[0]

        # Trimmed-table stages: mid-axes batched sort + final-axis sorts.
        u_h1 = jnp.where(jnp.arange(Mc) < occupied, C1[:Mc], L._PAD_H1)
        u_h2v = jnp.where(jnp.arange(Mc) < occupied, H2[:Mc], L._PAD_H2)
        u_s = jnp.where(jnp.arange(Mc) < occupied, (K0[:Mc] & L._S_MASK) - L._S_BIAS, 0)
        iota_c = jnp.arange(Mc, dtype=jnp.int32)

        def stage_mid(i, c):
            if d < 2:
                return c
            rank_d = iota_c
            c1m, c2m = L._chain_words(u_h1 + c, u_h2v, u_s, np.arange(1, d), d)
            c2pm = L._pack(c2m, u_s[None, :])
            c1n, c2n = L._chain_words(u_h1, u_h2v, u_s, np.arange(2, d + 1), d)
            c2pn = L._pack(c2n, u_s[None, :])
            zrow = jnp.zeros((1, Mc), jnp.int32)
            p1 = jnp.concatenate([c1n[:-1], rank_d[None]], axis=0)
            p2 = jnp.concatenate([c2pn[:-1], zrow], axis=0)
            K1s, K2s, T1, T2 = jax.lax.sort((c1m, c2pm, p1, p2), dimension=1, num_keys=2)
            mmid = L._axis_tap_weights(K1s, K2s, 1, order, cs)
            return T1[0, 0] + T2[0, 0] + mmid.sum().astype(jnp.int32)

        def stage_final(i, c):
            c1d, c2d = L._chain_words(u_h1 + c, u_h2v, u_s, np.array([d]), d)
            C1d, C2pd, perm_d = jax.lax.sort((c1d[0], L._pack(c2d[0], u_s), iota_c), num_keys=2)
            rank_d = jax.lax.sort((perm_d, iota_c), num_keys=1)[1]
            md = L._axis_tap_weights(C1d, C2pd, d, order, cs)
            return rank_d[0] + md.sum().astype(jnp.int32)

        row = {"dataset": name, "n": n, "d": d, "order": order, "M": M,
               "capacity": capacity, "n_lattice": occupied}
        stages = [
            ("geometry_ms", stage_geometry, jnp.zeros((), jnp.float32)),
            ("sort1_dedup_ms", stage_sort1, jnp.zeros((), jnp.int32)),
            ("sort2_unsort_ms", stage_sort2, jnp.zeros((), jnp.int32)),
            ("sort3_compact_ms", stage_sort3, jnp.zeros((), jnp.int32)),
            ("mid_axes_ms", stage_mid, jnp.zeros((), jnp.int32)),
            ("final_axis_ms", stage_final, jnp.zeros((), jnp.int32)),
        ]
        total = 0.0
        for label, fn, init in stages:
            t = sync_time_chained(fn, init, chain=args.chain, reps=args.reps, floor=floor)
            row[label] = round(t * 1e3, 3)
            total += t

        # Whole build for cross-check (chained: rebuild with perturbed x).
        def whole(i, c):
            plan = L.build_plan_chain(x + c * 1e-9, dk.coeffs, dk.variance, capacity=capacity)
            return plan.weights[0, 0] + plan.n_lattice.astype(jnp.float32) * 1e-9

        t_whole = sync_time_chained(whole, jnp.zeros((), jnp.float32), chain=args.chain, reps=args.reps, floor=floor)
        row["stages_sum_ms"] = round(total * 1e3, 3)
        row["whole_build_ms"] = round(t_whole * 1e3, 3)
        row["device"] = str(jax.devices()[0])
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
