#!/bin/bash
# Round-5 stage-3 TPU queue (single chip, serialized).  Revised after the
# stage-1 results landed (runs/r5/quality_gap_*_n8192.jsonl):
#
#   * The clustered-geometry hypothesis is FALSIFIED as the whole story:
#     lattice inference still collapses at d=18 on clustered x
#     (simplex/lattice 0.63 vs dense 0.21).  The d=18 discretization error
#     at trained lengthscales (~6-9) dominates regardless of geometry.
#   * The sweep shows kernel choice matters enormously at d=18: matern
#     nu=1.5 lattice MVM rel_err 0.467 vs rbf 0.147 (orders 1-3 alike) --
#     the canonical matern config multiplies the error by ~3x.
#   * The reference's own published error is SMALL only at low d
#     (precipitation d=3: 0.027-0.066; houseelectric d=11 real data: 0.053)
#     and LARGE at high d (protein d=9: 0.506, keggdirected d=20: 0.185+).
#     The winnable production target is therefore the low-d, huge-n
#     geometry -- precipitation -- which is also the reference's headline
#     speedup dataset (6.7x over exact, BASELINE.md:15).
#
# Queue order = information value per wall-clock minute, north star first.
set -x
cd /root/repo

# 1) Decisive low-d 2x2: does lattice inference match dense inference at
#    d=3?  (Expected from rel_err 0.027-0.066: yes.)
timeout 3600 python experiments/quality_gap.py --dataset precipitation \
  --max-n 8192 --epochs 100 --kernel matern --ls-init median --min-noise 0.1 \
  --out runs/r5 --tag _n8192 > /tmp/qg_precip.log 2>&1

# 2) Kernel-tap hypothesis at d=18: same 2x2 as the canonical elevators run
#    but with the RBF kernel (lattice rel_err 0.147 vs matern's 0.467).
timeout 3600 python experiments/quality_gap.py --dataset elevators \
  --max-n 8192 --epochs 100 --kernel rbf --ls-init median --min-noise 0.1 \
  --out runs/r5 --tag _rbf_n8192 > /tmp/qg_elev_rbf.log 2>&1

# 3) NORTH STAR: full-scale precipitation production run (n=628,474, d=3)
#    on the fixed engine, canonical reference config (matern 1.5, order 1,
#    cg_tol 1.0, min_noise 0.1).
timeout 7200 python experiments/train_simplexgp.py --dataset precipitation \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 50 --log-int 10 --patience 20 \
  --out runs/r5 > /tmp/r5_precip.log 2>&1

# 4) Same-data dense gold standard (subset: dense is O(n^3)).
timeout 3600 python experiments/train_exact.py --dataset precipitation \
  --max-n 16384 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --patience 30 --out runs/r5 > /tmp/r5_exact_precip.log 2>&1

# 5) Fresh five-geometry perf table with the packed apply (VERDICT item 4).
timeout 3600 python experiments/baseline_table.py --reps 5 \
  > runs/baseline_table_r5.jsonl 2> /tmp/r5_baseline_table.log

# 6) SGPR / SKIP baseline training runs on the north-star dataset
#    (VERDICT item 6) -- the four-method paper comparison.
timeout 2400 python experiments/train_sgpr.py --dataset precipitation \
  --max-n 65536 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --out runs/r5 > /tmp/r5_sgpr_precip.log 2>&1
timeout 2400 python experiments/train_skip.py --dataset precipitation \
  --max-n 65536 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --out runs/r5 > /tmp/r5_skip_precip.log 2>&1
timeout 2400 python experiments/train_sgpr.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 100 \
  --out runs/r5 > /tmp/r5_sgpr_elevsparse.log 2>&1
timeout 2400 python experiments/train_skip.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 100 \
  --out runs/r5 > /tmp/r5_skip_elevsparse.log 2>&1

# 7) Anisotropic d=18 production candidate, long horizon (original stage-2
#    item; ARD screening at eval).
timeout 5400 python experiments/train_simplexgp.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 300 --patience 60 --prune-thresh 0.3 \
  --out runs/r5 > /tmp/r5_elevsparse.log 2>&1
timeout 2400 python experiments/train_exact.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 300 \
  --patience 60 --out runs/r5 > /tmp/r5_exact_elevsparse.log 2>&1

# 8) Reference MVM grid completion (VERDICT item 5): orders 4-5, nu=2.5.
#    Sweep appends per point, so partial coverage still lands.
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_ext.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_ext.log 2>&1
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_nu25.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_nu25.log 2>&1

echo DONE_STAGE3
