"""Diagnose the bimodal per-epoch NLML seen in the r2 elevators run.

The committed r2 run (runs/simplexgp_elevators_s0) oscillates between train
MLL ~= -1.42 and ~= -0.80 -- clusters 0.6 nats/point apart, far beyond
Hutchinson probe noise.  This driver separates the candidate causes at a
small, CPU-runnable geometry (elevators' d=18, default lengthscale init --
exactly the degenerate configuration of the r2 run):

  1. estimator variance at FIXED params: NLML over many probe keys
     (bimodality here = SLQ/CG estimator pathology);
  2. the same sweep with the preconditioner disabled (isolates
     preconditioned-SLQ vs plain SLQ);
  3. the same sweep at eval CG tolerance (isolates CG truncation, the
     reference trains at cg_tolerance=1.0 -- configs/simplexgp.yml);
  4. ground truth: dense Cholesky NLML at the same params.

Usage: python experiments/diagnose_nlml.py [--n 2048] [--keys 16]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--keys", type=int, default=16)
    ap.add_argument("--dataset", default="elevators")
    ap.add_argument("--ls-init", default="default", choices=["default", "median"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simplex_gp_tpu.linalg.mll import BBMMConfig
    from simplex_gp_tpu.models.exact_gp import DenseGP, SimplexGP
    from simplex_gp_tpu.utils import load_uci, prepare_dataset

    ds = prepare_dataset(load_uci(args.dataset), name=args.dataset, standardize=True)
    x = jnp.asarray(ds.train_x[: args.n])
    y = jnp.asarray(ds.train_y[: args.n])
    d = x.shape[1]

    init_kwargs = {}
    if args.ls_init == "median":
        sub = np.asarray(x)[:2000]
        d2 = ((sub[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
        init_kwargs["lengthscale"] = float(np.sqrt(np.median(d2[d2 > 0]))) / np.sqrt(2.0)

    configs = {
        "train_precond": BBMMConfig(),
        "train_noprecond": BBMMConfig(precond_rank=0),
        "evaltol_precond": BBMMConfig(cg_tolerance=1e-2),
        "probes50_precond": BBMMConfig(num_probes=50),
    }

    # Dense ground truth at the same params.
    dense = DenseGP(num_dims=d)
    raw = dense.init_params(**init_kwargs)
    gt = float(dense.nlml(raw, x, y, jax.random.PRNGKey(0)))
    print(json.dumps({"config": "dense_cholesky", "nlml": gt, "n": args.n, "d": d,
                      "ls_init": args.ls_init}), flush=True)

    for name, cfg in configs.items():
        model = SimplexGP(num_dims=d, order=1, bbmm=cfg)
        f = jax.jit(lambda r, k: model.nlml(r, x, y, k))
        vals = [float(f(raw, jax.random.PRNGKey(s))) for s in range(args.keys)]
        vals_np = np.asarray(vals)
        print(
            json.dumps(
                {
                    "config": name,
                    "mean": float(vals_np.mean()),
                    "std": float(vals_np.std()),
                    "min": float(vals_np.min()),
                    "max": float(vals_np.max()),
                    "spread": float(vals_np.max() - vals_np.min()),
                    "vs_dense": float(vals_np.mean() - gt),
                    "vals": [round(v, 4) for v in vals],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
