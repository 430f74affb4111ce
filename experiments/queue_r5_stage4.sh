#!/bin/bash
# Round-5 stage-4 TPU queue: stage-3 rerun after the dense-predict OOM fix
# (models/exact_gp.py matmul-form distances + blocked predict; the
# precipitation quality-gap died at the 62k-row val predict).  Waits for the
# still-running stage-3 elevators-rbf quality-gap (launched pre-fix, d=18 so
# unaffected), then continues the reprioritized plan.
set -x
cd /root/repo

# Wait for the specific still-running stage-3 job (PID passed as $1).
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

# 0) verify surfaces on the real chip (bench + MVM CLI) before the long runs.
timeout 900 python bench.py > /tmp/verify_bench.log 2>&1
timeout 900 python experiments/mvm_err.py --dataset snelson --order 1 \
  > /tmp/verify_mvm_snelson.log 2>&1

# 1) Decisive low-d 2x2, re-run on the fixed eval path.
timeout 3600 python experiments/quality_gap.py --dataset precipitation \
  --max-n 8192 --epochs 100 --kernel matern --ls-init median --min-noise 0.1 \
  --out runs/r5 --tag _n8192 > /tmp/qg_precip2.log 2>&1

# 2) NORTH STAR: full-scale precipitation production run (n=628,474, d=3).
timeout 7200 python experiments/train_simplexgp.py --dataset precipitation \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 50 --log-int 10 --patience 20 \
  --out runs/r5 > /tmp/r5_precip.log 2>&1

# 3) Same-data dense gold standard (subset; blocked predict).
timeout 3600 python experiments/train_exact.py --dataset precipitation \
  --max-n 16384 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --patience 30 --out runs/r5 > /tmp/r5_exact_precip.log 2>&1

# 4) Fresh five-geometry perf table with the packed apply (VERDICT item 4).
timeout 3600 python experiments/baseline_table.py --reps 5 \
  > runs/baseline_table_r5.jsonl 2> /tmp/r5_baseline_table.log

# 5) SGPR / SKIP baselines on the north-star dataset (VERDICT item 6).
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

# 6) Anisotropic d=18 production candidate, long horizon.
timeout 5400 python experiments/train_simplexgp.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 300 --patience 60 --prune-thresh 0.3 \
  --out runs/r5 > /tmp/r5_elevsparse.log 2>&1
timeout 2400 python experiments/train_exact.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 300 \
  --patience 60 --out runs/r5 > /tmp/r5_exact_elevsparse.log 2>&1

# 7) Reference MVM grid completion (orders 4-5, nu=2.5; appends per point).
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_ext.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_ext.log 2>&1
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_nu25.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_nu25.log 2>&1

echo DONE_STAGE4
