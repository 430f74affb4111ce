"""Prototype: can a Gaussian-mixture lattice beat the matern tap filter?

Matern kernels are scale mixtures of Gaussians; the lattice filter is most
accurate for Gaussians (the permutohedral construction is designed for them:
elevators d=18 order-1 rel_err 0.147 rbf vs 0.467 matern,
runs/sweep_mvm_err_tpu).  This prototype measures, on CPU at small n, the
achievable MVM accuracy of

    K_matern @ v  ~=  sum_j  w_j * RBFLattice(x * alpha_j) @ v,   w_j >= 0

with weights fit two ways:

  * operator-NNLS (oracle): fit w against the EXACT dense operator's action
    on probe vectors, evaluate on held-out probes.  Upper bound on what any
    weight-fitting scheme can reach with this component family.
  * profile-NNLS (deployable): fit w against the matern radial profile on a
    distance grid weighted by the data's pairwise-distance density -- needs
    no dense operator, so it can run at production scale.

Also sweeps the matern tap spacing multiplier (the coverage-matching
criterion's one free parameter) to check whether the 0.467 is just a
mis-tuned spacing.

Run on CPU (the TPU queue owns the chip): JAX_PLATFORMS=cpu.
"""

import json
import sys
import pathlib

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np
import jax

# The axon TPU plugin ignores JAX_PLATFORMS=cpu (see .claude/skills/verify);
# config.update before backend init is the reliable way to stay off the chip.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from simplex_gp_tpu.ops import kernels as K
from simplex_gp_tpu.ops.coeffs import tap_variance
from simplex_gp_tpu.ops.lattice import filter_once
from simplex_gp_tpu.utils.data import _synthetic_uci


def rel_err(approx: np.ndarray, exact: np.ndarray) -> float:
    scale = (approx * exact).sum() / (approx * approx).sum()
    return float(np.linalg.norm(scale * approx - exact) / np.linalg.norm(exact))


def rel_err_noscale(approx: np.ndarray, exact: np.ndarray) -> float:
    return float(np.linalg.norm(approx - exact) / np.linalg.norm(exact))


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "elevators"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    order = 1
    nu = 1.5

    raw = _synthetic_uci(dataset)
    x = raw[:n, :-1]
    x = (x - x.mean(0)) / (x.std(0) + 1e-6)
    d = x.shape[1]
    rng = np.random.default_rng(0)
    v_tr = rng.normal(size=(n, 8)).astype(np.float32)
    v_te = rng.normal(size=(n, 4)).astype(np.float32)

    dk = K.matern_kernel(nu, order)
    xj = jnp.asarray(x)

    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    Km = np.asarray(K.kernel_value_jnp(dk, jnp.asarray(d2)))
    ex_tr = Km @ v_tr
    ex_te = Km @ v_te

    flt = lambda vv, xx, c, var: filter_once(vv, xx, c, float(var))

    cur = np.asarray(flt(jnp.asarray(v_te), xj, dk.coeffs, dk.variance))
    base = rel_err(cur, ex_te)
    print(json.dumps({"probe": "current_matern_taps", "dataset": dataset, "n": n,
                      "d": d, "order": order, "rel_err": base}))

    # --- spacing sweep for matern taps ---------------------------------
    r = order
    best = (None, np.inf)
    for s in np.geomspace(0.2, 6.0, 13):
        taps = K._matern((s * np.arange(-r, r + 1)) ** 2, nu)
        taps = tuple(float(t) for t in (taps / taps[r]))
        var = tap_variance(np.asarray(taps))
        out = np.asarray(flt(jnp.asarray(v_te), xj, taps, var))
        e = rel_err(out, ex_te)
        print(json.dumps({"probe": "matern_spacing", "s": round(float(s), 4),
                          "rel_err": e}))
        if e < best[1]:
            best = (float(s), e)
    print(json.dumps({"probe": "matern_spacing_best", "s": best[0], "rel_err": best[1]}))

    # --- Gaussian mixture ----------------------------------------------
    rdk = K.rbf_kernel(order)
    alphas = np.geomspace(0.25, 4.0, 10)
    cols_tr, cols_te = [], []
    for a in alphas:
        cols_tr.append(np.asarray(flt(jnp.asarray(v_tr), xj * float(a), rdk.coeffs, rdk.variance)))
        cols_te.append(np.asarray(flt(jnp.asarray(v_te), xj * float(a), rdk.coeffs, rdk.variance)))
    A = np.stack([c.ravel() for c in cols_tr], axis=1)  # (n*8, J)
    b = ex_tr.ravel()

    from scipy.optimize import nnls

    w, _ = nnls(A, b)
    mix_te = sum(float(wj) * c for wj, c in zip(w, cols_te))
    e_or = rel_err_noscale(mix_te, ex_te)
    print(json.dumps({"probe": "mixture_operator_nnls", "alphas": [round(float(a), 3) for a in alphas],
                      "w": [round(float(x), 4) for x in w], "rel_err": e_or}))

    # --- deployable profile fit ----------------------------------------
    # Frobenius-norm weighting: for random v, E||(Khat - K) v||^2 =
    # ||Khat - K||_F^2 = n^2 * int rho(r) (khat - k)^2 dr over the pairwise-
    # distance density rho, so the profile residual weight is sqrt(rho).
    sub = x[rng.permutation(n)[:512]]
    pd = np.sqrt(((sub[:, None, :] - sub[None, :, :]) ** 2).sum(-1)).ravel()
    pd = pd[pd > 0]
    grid = np.linspace(0.0, np.quantile(pd, 0.999), 400)
    dens, edges = np.histogram(pd, bins=grid, density=True)
    mid = 0.5 * (edges[1:] + edges[:-1])
    kfun = np.asarray(K.kernel_value_jnp(dk, jnp.asarray(mid.astype(np.float32) ** 2)))
    wts = np.sqrt(np.maximum(dens, 0.0))
    comp = np.exp(-np.outer(mid**2, alphas**2))  # (G, J)
    wprof, _ = nnls(wts[:, None] * comp, wts * kfun)
    mix_te_p = sum(float(wj) * c for wj, c in zip(wprof, cols_te))
    print(json.dumps({"probe": "mixture_profile_nnls",
                      "w": [round(float(x), 4) for x in wprof],
                      "rel_err": rel_err_noscale(mix_te_p, ex_te),
                      "rel_err_scaled": rel_err(mix_te_p, ex_te)}))

    # --- deployable subset-operator fit --------------------------------
    # Fit w against the EXACT operator on a small random subset (dense at
    # m=1024 is cheap at any production n), then apply the weights to the
    # full-size lattice components.  This absorbs each component's own
    # discretization (which the ideal-Gaussian profile fit cannot).
    m = 1024
    idx = rng.permutation(n)[:m]
    xs = x[idx]
    d2s = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    Ks = np.asarray(K.kernel_value_jnp(dk, jnp.asarray(d2s)))
    vs = rng.normal(size=(m, 8)).astype(np.float32)
    exs = Ks @ vs
    xsj = jnp.asarray(xs)
    As = np.stack(
        [np.asarray(flt(jnp.asarray(vs), xsj * float(a), rdk.coeffs, rdk.variance)).ravel()
         for a in alphas], axis=1)
    wsub, _ = nnls(As, exs.ravel())
    mix_te_s = sum(float(wj) * c for wj, c in zip(wsub, cols_te))
    print(json.dumps({"probe": "mixture_subset_operator_nnls", "m": m,
                      "w": [round(float(x), 4) for x in wsub],
                      "rel_err": rel_err_noscale(mix_te_s, ex_te),
                      "rel_err_scaled": rel_err(mix_te_s, ex_te)}))


if __name__ == "__main__":
    main()
