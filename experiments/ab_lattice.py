"""A/B the r3-vs-r4 lattice apply path in ONE device session (VERDICT r4 item 4).

BENCH_r04 regressed vs BENCH_r03 (apply-only 9.8 -> 14.2 ms at the elevators
geometry) across ~230 changed lines of ops/lattice.py (vertex-major layout,
binary-search leader compaction, capacity guard).  But the two driver sessions
also measured very different sync floors (73.2 vs 33.7 ms): the chained-timing
estimate subtracts a separately-measured floor at 1/chain strength, so a floor
measured under different tunnel contention than the timed reps biases the
estimate by up to |dfloor|/chain ~ 5 ms -- the same magnitude as the delta.

This script removes the session confound: both engines (the current tree and a
pinned historical copy extracted via ``git show <rev>:...lattice.py``) are
timed back-to-back in one process against the same floor, same inputs.

Usage:
    git show f75eb38:simplex_gp_tpu/ops/lattice.py > /tmp/lattice_r3.py
    python experiments/ab_lattice.py --old /tmp/lattice_r3.py \
        --out runs/r5/ab_lattice.jsonl
"""

import argparse
import importlib.util
import json
import pathlib
import sys
import time

import numpy as np

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--old", required=True, help="path to the historical lattice.py")
    p.add_argument("--out", default="runs/r5/ab_lattice.jsonl")
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from simplex_gp_tpu.ops import kernels as K
    from simplex_gp_tpu.ops import lattice as lat_new
    from simplex_gp_tpu.utils.timing import (
        sync_floor,
        sync_time_chained,
        warmup_device,
        with_retries,
    )

    lat_old = load_module(args.old, "lattice_old")

    out_path = pathlib.Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out = open(out_path, "w")

    def emit(rec):
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()

    t_warm = with_retries(lambda: warmup_device(), what="warmup")
    floor = with_retries(lambda: sync_floor(), what="sync_floor")
    emit({"phase": "session", "device": str(jax.devices()[0]),
          "warmup_s": round(t_warm, 1), "sync_floor_ms": round(floor * 1e3, 3),
          "chain": args.chain, "reps": args.reps})

    dk = K.rbf_kernel(1)

    # The BENCH geometry (elevators) plus the leader-compaction-sensitive one
    # (precipitation: tiny occupancy fraction, where r4's binary-search
    # compaction replaced the full-M sort).
    geoms = [("elevators", 16599, 17), ("precipitation", 628474, 3)]

    def renorm(t):
        return t / jnp.maximum(jnp.abs(t).max(), 1e-30)

    for gname, n, d in geoms:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        v1 = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
        v8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
        for tag, mod in [("r4_current", lat_new), ("old", lat_old)]:
            t0 = time.perf_counter()
            plan = mod.build_plan(x, dk.coeffs, dk.variance)
            jax.block_until_ready(jax.tree.leaves(plan))
            build_s = time.perf_counter() - t0  # incl. compile (logged as-is)

            def apply_step(i, carry, mod=mod, plan=plan):
                return renorm(mod.apply_plan(plan, carry, dk.coeffs))

            t1 = with_retries(
                lambda: sync_time_chained(apply_step, v1, chain=args.chain, reps=args.reps, floor=floor),
                what=f"{gname}/{tag}/apply1",
            )
            t8 = with_retries(
                lambda: sync_time_chained(apply_step, v8, chain=args.chain, reps=args.reps, floor=floor),
                what=f"{gname}/{tag}/apply8",
            )

            def full_step(i, carry, mod=mod, x=x):
                xi = x + 1e-30 * carry
                return renorm(mod.filter_once(carry, xi, dk.coeffs, dk.variance))

            tf = with_retries(
                lambda: sync_time_chained(full_step, v1, chain=args.chain, reps=args.reps, floor=floor),
                what=f"{gname}/{tag}/full",
            )
            emit({"geom": gname, "n": n, "d": d, "engine": tag,
                  "apply1_ms": round(t1 * 1e3, 3), "apply8_ms": round(t8 * 1e3, 3),
                  "full_ms": round(tf * 1e3, 3),
                  "first_build_incl_compile_s": round(build_s, 2)})
    out.close()


if __name__ == "__main__":
    main()
