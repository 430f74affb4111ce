"""Headline benchmark: lattice-filter MVM wall time on elevators shapes.

Mirrors the reference's MVM benchmark (experiments/mvm_err.py, timed via CUDA
events over 5 iterations) on its headline dataset geometry: elevators
(n=16599, d=17; BASELINE.md).  The reference simplex filter takes 0.083 s per
MVM on its (unnamed) GPU; ``vs_baseline`` is that time divided by ours
(>1 means faster than the reference).

Timing includes the full filter (lattice/plan build + splat/blur/slice), as
the reference rebuilds its hash table every MVM.  The amortized apply-only
time (our CG iteration cost, where the plan is reused) is reported inside the
metric line's auxiliary fields, along with the apply time for a batch of 8
right-hand sides (the shape the BBMM engine actually runs: probes + y solve
together, and one TPU gather serves 8 f32 columns for the price of 1).

All timings synchronize via a device-to-host transfer (see
simplex_gp_tpu/utils/timing.py: ``jax.block_until_ready`` returns early on
the tunneled TPU runtime and must not be trusted for wall-clock numbers).

Prints ONE JSON line on stdout.
"""

import json
import sys

import numpy as np

REF_SIMPLEX_MVM_S = 0.083  # BASELINE.md elevators simplex MVM wall-time


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from simplex_gp_tpu.ops import kernels as K
    from simplex_gp_tpu.ops.lattice import apply_plan, build_plan, filter_once
    from simplex_gp_tpu.utils.timing import sync_floor, sync_time

    n, d = 16599, 17  # elevators (BASELINE.md)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    v8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    dk = K.rbf_kernel(1)

    full = jax.jit(lambda vv, xx: filter_once(vv, xx, dk.coeffs, dk.variance))
    plan = build_plan(x, dk.coeffs, dk.variance)
    apply_only = jax.jit(lambda p, vv: apply_plan(p, vv, dk.coeffs))

    floor = sync_floor()
    t_full = max(sync_time(full, v, x, reps=10) - floor, 1e-9)
    t_apply = max(sync_time(apply_only, plan, v, reps=10) - floor, 1e-9)
    t_apply8 = max(sync_time(apply_only, plan, v8, reps=10) - floor, 1e-9)

    print(
        json.dumps(
            {
                "metric": "elevators_lattice_mvm_time",
                "value": round(t_full * 1e3, 3),
                "unit": "ms",
                "vs_baseline": round(REF_SIMPLEX_MVM_S / t_full, 3),
                "apply_only_ms": round(t_apply * 1e3, 3),
                "apply_8rhs_ms": round(t_apply8 * 1e3, 3),
                "sync_floor_ms": round(floor * 1e3, 3),
                "n": n,
                "d": d,
                "order": 1,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
