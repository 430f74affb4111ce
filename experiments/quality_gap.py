"""Controlled SimplexGP-vs-DenseGP quality attribution (VERDICT r3 item 2).

The committed r3 elevators runs show SimplexGP test RMSE 0.577 vs DenseGP
0.311 on the same data.  This experiment pins down WHERE the loss happens by
crossing {dense-trained, simplex-trained} hyperparameters with {dense,
lattice} posterior inference on a subset where DenseGP is exact:

  (a) dense params   x dense inference    -- the gold standard;
  (b) dense params   x lattice inference  -- isolates discretized-POSTERIOR
      error at good hyperparameters (CG at eval tol + LOVE root + rect
      filter quality);
  (c) simplex params x lattice inference  -- the production pipeline;
  (d) simplex params x dense inference    -- isolates TRAINING quality (did
      the stochastic lattice NLML find good hyperparameters?).

If (b) ~= (a), the lattice posterior is sound and the gap is training
dynamics; if (d) ~= (a), training is sound and the gap is inference.  Also
records the lattice-vs-dense NLML and MVM relative error at the dense-trained
params, quantifying the discretization error term at the hyperparameters
that actually matter (the reference's mvm_err benchmark only measures at
init lengthscales -- configs/mvm_err.yml).

Reference parity standard being extended: tests/train_snelson.py:88-96
(|MLL gap| < 0.1 at d=1) probed at realistic d.
"""

import argparse
import json
import pathlib
import sys
import time

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
_HERE = str(pathlib.Path(__file__).resolve().parent)
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from common import add_common_args, init_kwargs, load_dataset, regression_metrics  # noqa: E402


def train(model, raw, x, y, epochs, lr, seed, label):
    import jax
    import jax.numpy as jnp
    import optax

    opt = optax.adam(lr)
    opt_state = opt.init(raw)

    @jax.jit
    def step(raw, opt_state, key):
        loss, grads = jax.value_and_grad(lambda r: model.nlml(r, x, y, key))(raw)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(raw, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    mlls = []
    t0 = time.perf_counter()
    for epoch in range(epochs):
        key, k1 = jax.random.split(key)
        raw, opt_state, loss = step(raw, opt_state, k1)
        mlls.append(-float(loss))
    print(json.dumps({"phase": f"train_{label}", "mll_first": mlls[0],
                      "mll_last": mlls[-1], "mll_tail_std": float(jnp.std(jnp.asarray(mlls[-20:]))),
                      "ts": time.perf_counter() - t0}), flush=True)
    return raw, mlls


def main():
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--kernel", default="rbf", choices=["rbf", "matern", "mixture"])
    p.add_argument("--nu", type=float, default=1.5)
    p.add_argument("--order", type=int, default=1)
    p.add_argument("--cg-tol", type=float, default=1.0)
    p.add_argument("--cg-iter", type=int, default=500)
    p.add_argument("--eval-cg-tol", type=float, default=1e-2)
    p.add_argument("--lanc-iter", type=int, default=100)
    p.add_argument("--pre-size", type=int, default=100)
    p.add_argument("--root-rank", type=int, default=0, help="LOVE root rank override (0 = lanc-iter)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--tag", default="", help="suffix for the output file")
    p.add_argument(
        "--prune-thresh", type=float, default=0.0,
        help="ARD dimension screening for lattice INFERENCE: drop input dims "
        "whose inverse lengthscale is below this fraction of the max "
        "(0 disables).  A dim with lengthscale L contributes <= (dx/L)^2 "
        "to scaled distances -- negligible for the near-irrelevant dims ARD "
        "identifies -- while every embedded dim degrades the permutohedral "
        "approximation (the reference's own rel-err tables worsen with d: "
        "protein d=9 0.506, BASELINE.md:22).  Screening trades a tiny exact-"
        "kernel perturbation for a large lattice-accuracy gain.")
    args = p.parse_args()

    if args.cpu:
        import jax

        import jax._src.xla_bridge as _xb

        assert not _xb._backends, "backend initialized before --cpu could take effect"
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from simplex_gp_tpu import BBMMConfig, DenseGP, SimplexGP

    ds = load_dataset(args)
    x = jnp.asarray(ds.train_x)
    y = jnp.asarray(ds.train_y)
    xv, yv = jnp.asarray(ds.val_x), ds.val_y
    xt, yt = jnp.asarray(ds.test_x), ds.test_y
    d = x.shape[-1]
    kw = init_kwargs(args, ds)

    # The mixture kernel TARGETS matern-nu, so the dense gold side is matern.
    dense_kernel = "matern" if args.kernel == "mixture" else args.kernel
    dense = DenseGP(num_dims=d, kernel=dense_kernel, nu=args.nu, min_noise=args.min_noise)
    simplex = SimplexGP(
        num_dims=d, kernel=args.kernel, nu=args.nu, order=args.order,
        min_noise=args.min_noise,
        bbmm=BBMMConfig(
            cg_tolerance=args.cg_tol, max_cg_iterations=args.cg_iter,
            max_lanczos_iterations=args.lanc_iter, precond_rank=args.pre_size,
        ),
        eval_cg_tolerance=args.eval_cg_tol,
    )
    if args.kernel == "mixture":
        simplex = simplex.with_fitted_mixture(simplex.init_params(**kw), x)
        print("mixture weights (subset fit):",
              [round(w, 4) for w in simplex.mix_weights], flush=True)

    out_path = pathlib.Path(args.out) / f"quality_gap_{args.dataset}{args.tag}.jsonl"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out = open(out_path, "w")

    def emit(rec):
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()

    emit({"dataset": args.dataset, "n": int(x.shape[0]), "d": int(d),
          "order": args.order, "kernel": args.kernel,
          "cg_tol": args.cg_tol, "eval_cg_tol": args.eval_cg_tol,
          "pre_size": args.pre_size, "ls_init": args.ls_init})

    raw_d, mlls_d = train(dense, dense.init_params(**kw), x, y, args.epochs, args.lr, args.seed, "dense")
    raw_s, mlls_s = train(simplex, simplex.init_params(**kw), x, y, args.epochs, args.lr, args.seed, "simplex")
    emit({"phase": "train_curves",
          "dense_mll_tail_std": float(np.std(mlls_d[-20:])),
          "simplex_mll_tail_std": float(np.std(mlls_s[-20:]))})

    key = jax.random.PRNGKey(args.seed + 1000)
    root_rank = args.root_rank or None

    def lattice_predict(raw, x_eval):
        cache = simplex.posterior_cache(raw, x, y, key, root_rank=root_rank)
        return simplex.predict_from_cache(cache, x, x_eval)

    def pruned_predict(raw_p, x_eval):
        """Lattice inference with ARD-screened dims (see --prune-thresh)."""
        import dataclasses

        inv_ell = np.asarray(simplex.constrained(raw_p)["inv_ell"])
        keep = np.where(inv_ell >= args.prune_thresh * inv_ell.max())[0]
        sub = dataclasses.replace(simplex, num_dims=len(keep))
        raw_sub = dict(raw_p)
        raw_sub["raw_lengthscale"] = jnp.asarray(raw_p["raw_lengthscale"])[keep]
        cache = sub.posterior_cache(raw_sub, x[:, keep], y, key, root_rank=root_rank)
        return sub.predict_from_cache(cache, x[:, keep], x_eval[:, keep]), len(keep)

    combos = {
        "dense_params/dense_inf": lambda xe: dense.predict(raw_d, x, y, xe),
        "dense_params/lattice_inf": lambda xe: lattice_predict(raw_d, xe),
        "simplex_params/lattice_inf": lambda xe: lattice_predict(raw_s, xe),
        "simplex_params/dense_inf": lambda xe: dense.predict(raw_s, x, y, xe),
    }
    for name, fn in combos.items():
        vm, vv = fn(xv)
        tm, tv = fn(xt)
        emit({"combo": name,
              **{f"val/{k}": v for k, v in regression_metrics(vm, vv, yv).items()},
              **{f"test/{k}": v for k, v in regression_metrics(tm, tv, yt).items()}})

    if args.prune_thresh > 0:
        for label, raw_p in [("dense_params", raw_d), ("simplex_params", raw_s)]:
            (vm, vv), d_eff = pruned_predict(raw_p, xv)
            (tm, tv), _ = pruned_predict(raw_p, xt)
            emit({"combo": f"{label}/pruned_lattice_inf", "d_eff": d_eff,
                  "prune_thresh": args.prune_thresh,
                  **{f"val/{k}": v for k, v in regression_metrics(vm, vv, yv).items()},
                  **{f"test/{k}": v for k, v in regression_metrics(tm, tv, yt).items()}})

    # Discretization terms at the DENSE-trained params: NLML gap and MVM
    # relative error of the lattice operator vs the exact kernel.
    for label, raw_p in [("dense_params", raw_d), ("simplex_params", raw_s)]:
        params = simplex.constrained(raw_p)
        nl_d = float(dense.nlml(raw_p, x, y))
        nl_s = float(simplex.nlml(raw_p, x, y, jax.random.PRNGKey(7)))
        Kd = dense._kmat(params, x, x)
        rng = np.random.default_rng(3)
        v = jnp.asarray(rng.normal(size=(x.shape[0], 8)).astype(np.float32))
        from simplex_gp_tpu.ops.filter import lattice_filter_exact_grad

        ref = x * params["inv_ell"]
        kv_lat = params["outputscale"] * lattice_filter_exact_grad(v, ref, simplex.dk)
        kv_dense = Kd @ v
        rel = float(jnp.linalg.norm(kv_lat - kv_dense) / jnp.linalg.norm(kv_dense))
        cos = float((kv_lat * kv_dense).sum() / (jnp.linalg.norm(kv_lat) * jnp.linalg.norm(kv_dense)))
        emit({"phase": f"discretization@{label}", "nlml_dense": nl_d, "nlml_lattice": nl_s,
              "nlml_gap": nl_s - nl_d, "mvm_rel_err": rel, "mvm_cos": cos,
              "mean_lengthscale": float(np.mean(1.0 / np.asarray(params["inv_ell"]))),
              "noise": float(params["noise"])})
    out.close()


if __name__ == "__main__":
    main()
