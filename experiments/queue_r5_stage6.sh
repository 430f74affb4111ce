#!/bin/bash
# Round-5 stage-6 TPU queue: relaunch after the SPD-preconditioner fix
# (commit 5b697f6) -- production run first, then verify surfaces, mixture
# rows, golds, perf table, baselines, long-horizon d=18, sweeps.
set -x
cd /root/repo

# 1) NORTH STAR: full-scale precipitation production run, fixed engine.
timeout 5400 python experiments/train_simplexgp.py --dataset precipitation \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 50 --log-int 10 --patience 20 \
  --out runs/r5 > /tmp/r5_precip.log 2>&1

# 2) verify surfaces on the real chip.
timeout 900 python bench.py > /tmp/verify_bench.log 2>&1
timeout 900 python experiments/mvm_err.py --dataset snelson --order 1 \
  > /tmp/verify_mvm_snelson.log 2>&1

# 3) Mixture-kernel accuracy rows (the beats-the-reference feature).
for DS in elevators protein keggdirected; do
  timeout 1800 python experiments/mvm_err.py --dataset $DS --kernel mixture \
    --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
  timeout 1800 python experiments/mvm_err.py --dataset $DS --kernel matern \
    --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
done

# 4) Same-data dense gold for the production run.
timeout 3600 python experiments/train_exact.py --dataset precipitation \
  --max-n 16384 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --patience 30 --out runs/r5 > /tmp/r5_exact_precip.log 2>&1

# 5) Low-d 2x2 on the fixed engine + fixed eval path.
timeout 3600 python experiments/quality_gap.py --dataset precipitation \
  --max-n 8192 --epochs 100 --kernel matern --ls-init median --min-noise 0.1 \
  --out runs/r5 --tag _n8192 > /tmp/qg_precip2.log 2>&1

# 6) Fresh five-geometry perf table with the packed apply.
timeout 3600 python experiments/baseline_table.py --reps 5 \
  > runs/baseline_table_r5.jsonl 2> /tmp/r5_baseline_table.log

# 7) SGPR / SKIP baselines on the north-star dataset.
timeout 2400 python experiments/train_sgpr.py --dataset precipitation \
  --max-n 65536 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --out runs/r5 > /tmp/r5_sgpr_precip.log 2>&1
timeout 2400 python experiments/train_skip.py --dataset precipitation \
  --max-n 65536 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --out runs/r5 > /tmp/r5_skip_precip.log 2>&1

# 8) Anisotropic d=18 production candidate, long horizon.
timeout 5400 python experiments/train_simplexgp.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 300 --patience 60 --prune-thresh 0.3 \
  --out runs/r5 > /tmp/r5_elevsparse.log 2>&1
timeout 2400 python experiments/train_exact.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 300 \
  --patience 60 --out runs/r5 > /tmp/r5_exact_elevsparse.log 2>&1

# 9) Reference MVM grid completion (appends per point).
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_ext.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_ext.log 2>&1
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_nu25.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_nu25.log 2>&1

echo DONE_STAGE6
