#!/bin/bash
# Round-5 stage-8 (final) queue: exact precipitation gold first (predict
# block shrunk to 4096 after the triangular-solve OOM), then the remaining
# elevators matern row, perf table, low-d 2x2, houseelectric.
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
timeout 2400 python experiments/train_exact.py --dataset precipitation \
  --max-n 16384 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --patience 30 --out runs/r5 > /tmp/r5_exact_precip2.log 2>&1
timeout 1800 python experiments/mvm_err.py --dataset elevators --kernel matern \
  --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
timeout 2700 python experiments/baseline_table.py --reps 5 \
  > runs/baseline_table_r5.jsonl 2> /tmp/r5_baseline_table.log
timeout 2700 python experiments/quality_gap.py --dataset precipitation \
  --max-n 8192 --epochs 100 --kernel matern --ls-init median --min-noise 0.1 \
  --out runs/r5 --tag _n8192 > /tmp/qg_precip2.log 2>&1
timeout 5400 python experiments/train_simplexgp.py --dataset houseelectric \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 30 --log-int 10 --patience 20 \
  --plan-capacity -1 --host-loop --out runs/r5 > /tmp/r5_he.log 2>&1
echo DONE_STAGE8
