"""Large-scale engine differential: sort-chain vs gather-join vs fused filter.

VERDICT item 8: the chain plan identifies lattice points by 43 hash bits +
21 bits of coordinate sum (ops/lattice.py _pack), with an estimated ~1e-3
fraction of falsely merged chains at houseelectric scale; the join plan uses
the full 64-bit hash pair.  The two engines are independent implementations
of the same operator (different dedup, different blur mechanics), so their
agreement at n >= 1e6 empirically bounds the chain-hash collision error at
the scale where it matters -- the large-n analogue of the reference's
CPU-vs-CUDA differential test (experiments/cuda_test.py).

    python experiments/chain_vs_join.py --n 1000000 --d 11 --order 1

Prints one JSON line; ``rel_err`` should sit at f32 reduction noise (~1e-6),
far below the filter's intrinsic discretization error (~1e-1).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=11)
    p.add_argument("--c", type=int, default=2)
    p.add_argument("--order", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp

    from simplex_gp_tpu.ops import kernels as K
    from simplex_gp_tpu.ops.lattice import (
        apply_plan_chain,
        apply_plan_join,
        build_plan_chain,
        build_plan_join,
        filter_fused,
    )
    from simplex_gp_tpu.utils.timing import device_sync, warmup_device

    warmup_device()
    dk = K.rbf_kernel(args.order)
    rng = np.random.default_rng(args.seed)
    x = jnp.asarray(rng.normal(size=(args.n, args.d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(args.n, args.c)).astype(np.float32))

    cplan = build_plan_chain(x, dk.coeffs, dk.variance)
    out_c = np.asarray(apply_plan_chain(cplan, v, dk.coeffs))
    n_lat_chain = int(cplan.n_lattice)
    del cplan
    device_sync(out_c[0, 0])

    # Third leg: the fused one-shot engine (full-precision 3-key chain sorts;
    # the production rebuild-every-MVM path).
    out_f = np.asarray(filter_fused(v, x, dk.coeffs, dk.variance))
    device_sync(out_f[0, 0])

    jplan = build_plan_join(x, dk.coeffs, dk.variance)
    out_j = np.asarray(apply_plan_join(jplan, v, dk.coeffs))
    n_lat_join = int(jplan.n_lattice)

    rel = float(np.linalg.norm(out_c - out_j) / max(np.linalg.norm(out_j), 1e-30))
    denom = np.maximum(np.abs(out_j), 1e-3)
    print(
        json.dumps(
            {
                "n": args.n,
                "d": args.d,
                "c": args.c,
                "order": args.order,
                "rel_err": rel,
                "rel_err_fused_vs_join": float(
                    np.linalg.norm(out_f - out_j) / max(np.linalg.norm(out_j), 1e-30)
                ),
                "max_abs_err": float(np.abs(out_c - out_j).max()),
                "max_pointwise_rel": float((np.abs(out_c - out_j) / denom).max()),
                "n_lattice_chain": n_lat_chain,
                "n_lattice_join": n_lat_join,
                # Chain dedup may split/merge a handful of points on hash
                # collisions; the count difference is the direct collision
                # census (expected 0 or single digits).
                "n_lattice_diff": n_lat_chain - n_lat_join,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
