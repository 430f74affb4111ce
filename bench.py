"""Headline benchmark: lattice-filter MVM wall time on elevators shapes.

Mirrors the reference's MVM benchmark (experiments/mvm_err.py, timed via CUDA
events over 5 iterations) on its headline dataset geometry: elevators
(n=16599, d=17; BASELINE.md).  The reference simplex filter takes 0.083 s per
MVM on its (unnamed) GPU; ``vs_baseline`` is that time divided by ours
(>1 means faster than the reference).

Timing includes the full filter (lattice/plan build + splat/blur/slice), as
the reference rebuilds its hash table every MVM.  The amortized apply-only
time (our CG iteration cost, where the plan is reused) is reported inside the
metric line's auxiliary fields.

Prints ONE JSON line on stdout.
"""

import json
import sys
import time

import numpy as np

REF_SIMPLEX_MVM_S = 0.083  # BASELINE.md elevators simplex MVM wall-time


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from simplex_gp_tpu.ops import kernels as K
    from simplex_gp_tpu.ops.lattice import apply_plan, build_plan, filter_once

    n, d = 16599, 17  # elevators (BASELINE.md)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    dk = K.rbf_kernel(1)

    full = jax.jit(lambda vv, xx: filter_once(vv, xx, dk.coeffs, dk.variance))
    plan = build_plan(x, dk.coeffs, dk.variance)
    jax.block_until_ready(plan.seg_ids)
    apply_only = jax.jit(lambda p, vv: apply_plan(p, vv, dk.coeffs))

    # Warmup (compile), then time.
    jax.block_until_ready(full(v, x))
    jax.block_until_ready(apply_only(plan, v))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = full(v, x)
    jax.block_until_ready(out)
    t_full = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        out = apply_only(plan, v)
    jax.block_until_ready(out)
    t_apply = (time.perf_counter() - t0) / iters

    print(
        json.dumps(
            {
                "metric": "elevators_lattice_mvm_time",
                "value": round(t_full * 1e3, 3),
                "unit": "ms",
                "vs_baseline": round(REF_SIMPLEX_MVM_S / t_full, 3),
                "apply_only_ms": round(t_apply * 1e3, 3),
                "n": n,
                "d": d,
                "order": 1,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
