#!/bin/bash
# Round-5 stage-2 TPU queue (revised priority order): north-star production
# runs first (elevators_sparse 300-epoch + dense gold, houseelectric_sparse
# host-loop), then the fresh perf table and SGPR/SKIP baselines, and the
# reference MVM grid completion LAST (sweep appends per point, so partial
# coverage still lands if the round ends mid-sweep).
set -x
cd /root/repo

while pgrep -f "queue_r5_stage1" > /dev/null; do sleep 60; done

# North-star candidate: elevators_sparse production run, long enough for
# ARD to concentrate (the 100-epoch probe left inv_ell ratios under 10x;
# d_eff@0.3 hits the 4 relevant dims by epoch ~50), screening at eval.
timeout 7200 python experiments/train_simplexgp.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 300 --patience 60 --prune-thresh 0.3 \
  --out runs/r5 > /tmp/r5_elevsparse.log 2>&1

# Same-data dense gold.
timeout 3600 python experiments/train_exact.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 300 \
  --patience 60 --out runs/r5 > /tmp/r5_exact_elevsparse.log 2>&1

# North star at huge scale: host-orchestrated CG, capacity-trimmed plan,
# eval through the screened (low-d) lattice posterior.
timeout 10800 python experiments/train_simplexgp.py --dataset houseelectric_sparse \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 60 --log-int 10 --patience 20 --prune-thresh 0.3 \
  --plan-capacity -1 --host-loop --out runs/r5 > /tmp/r5_he_sparse.log 2>&1

# Fresh five-geometry perf table (VERDICT r4 item 4) with the packed apply.
timeout 3600 python experiments/baseline_table.py --reps 5 \
  > runs/baseline_table_r5.jsonl 2> /tmp/r5_baseline_table.log

# SGPR / SKIP baseline training runs (VERDICT r4 item 6).
timeout 3600 python experiments/train_sgpr.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 100 \
  --out runs/r5 > /tmp/r5_sgpr_elevsparse.log 2>&1
timeout 3600 python experiments/train_skip.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 100 \
  --out runs/r5 > /tmp/r5_skip_elevsparse.log 2>&1
timeout 3600 python experiments/train_sgpr.py --dataset protein \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 100 \
  --out runs/r5 > /tmp/r5_sgpr_protein.log 2>&1
timeout 3600 python experiments/train_skip.py --dataset protein \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 100 \
  --out runs/r5 > /tmp/r5_skip_protein.log 2>&1

# Reference MVM grid completion (VERDICT r4 item 5): orders 4-5 and nu=2.5.
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_ext.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_ext.log 2>&1
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_nu25.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_nu25.log 2>&1

echo DONE_STAGE2
