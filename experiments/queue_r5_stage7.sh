#!/bin/bash
# Round-5 stage-7 TPU queue: final consolidated priority order for the
# remaining round time.  Waits for the in-flight protein mixture row
# (PID $1), then: remaining mixture rows -> precipitation dense gold ->
# elevators mixture re-runs (subset-fit measurement fix) -> low-d 2x2 ->
# perf table -> HOUSEELECTRIC production run (the BASELINE.json north
# star, unblocked by the 5b697f6 CG fix) -> SGPR/SKIP baselines.
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

timeout 1800 python experiments/mvm_err.py --dataset protein --kernel matern \
  --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
timeout 1800 python experiments/mvm_err.py --dataset keggdirected --kernel mixture \
  --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
timeout 1800 python experiments/mvm_err.py --dataset keggdirected --kernel matern \
  --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log

timeout 2400 python experiments/train_exact.py --dataset precipitation \
  --max-n 16384 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --patience 30 --out runs/r5 > /tmp/r5_exact_precip.log 2>&1

timeout 1800 python experiments/mvm_err.py --dataset elevators --kernel mixture \
  --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
timeout 1800 python experiments/mvm_err.py --dataset elevators --kernel matern \
  --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log

timeout 2700 python experiments/quality_gap.py --dataset precipitation \
  --max-n 8192 --epochs 100 --kernel matern --ls-init median --min-noise 0.1 \
  --out runs/r5 --tag _n8192 > /tmp/qg_precip2.log 2>&1

timeout 2700 python experiments/baseline_table.py --reps 5 \
  > runs/baseline_table_r5.jsonl 2> /tmp/r5_baseline_table.log

# HOUSEELECTRIC north star (n=2,049,280, d=11): host-orchestrated CG with
# the SPD-guarded preconditioner; capacity-trimmed plan.
timeout 5400 python experiments/train_simplexgp.py --dataset houseelectric \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 30 --log-int 10 --patience 20 \
  --plan-capacity -1 --host-loop --out runs/r5 > /tmp/r5_he.log 2>&1

timeout 2400 python experiments/train_sgpr.py --dataset precipitation \
  --max-n 65536 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --out runs/r5 > /tmp/r5_sgpr_precip.log 2>&1
timeout 2400 python experiments/train_skip.py --dataset precipitation \
  --max-n 65536 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --out runs/r5 > /tmp/r5_skip_precip.log 2>&1

echo DONE_STAGE7
