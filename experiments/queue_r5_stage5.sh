#!/bin/bash
# Round-5 stage-5 TPU queue: consolidated remainder after the queue-process
# mixup (a surviving stage-3 shell launched the precipitation production run
# while stage-4 ran bench.py concurrently; both wrapper shells were killed,
# the production run kept).  Waits for the production run (PID $1), then
# runs verify surfaces, the new mixture-kernel accuracy rows, and the rest
# of the r5 plan in information-per-minute order.
set -x
cd /root/repo

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

# 0) verify surfaces on the real chip (clean, serialized this time).
timeout 900 python bench.py > /tmp/verify_bench.log 2>&1
timeout 900 python experiments/mvm_err.py --dataset snelson --order 1 \
  > /tmp/verify_mvm_snelson.log 2>&1

# 1) Mixture-kernel accuracy rows (the beats-the-reference feature):
#    subset-fit Gaussian mixture vs the matern tap filter at the geometries
#    where matern discretization is worst (d = 9..20).
for DS in elevators protein keggdirected; do
  timeout 1800 python experiments/mvm_err.py --dataset $DS --kernel mixture \
    --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
  timeout 1800 python experiments/mvm_err.py --dataset $DS --kernel matern \
    --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
done

# 2) Same-data dense gold for the precipitation production run.
timeout 3600 python experiments/train_exact.py --dataset precipitation \
  --max-n 16384 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --patience 30 --out runs/r5 > /tmp/r5_exact_precip.log 2>&1

# 3) Decisive low-d 2x2, re-run on the fixed blocked-predict eval path.
timeout 3600 python experiments/quality_gap.py --dataset precipitation \
  --max-n 8192 --epochs 100 --kernel matern --ls-init median --min-noise 0.1 \
  --out runs/r5 --tag _n8192 > /tmp/qg_precip2.log 2>&1

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

echo DONE_STAGE5
