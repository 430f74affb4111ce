#!/bin/bash
# Round-5 stage-3 TPU queue: houseelectric-scale north-star run (host loop,
# sparse geometry, ARD screening at eval), the r5 perf table, and the
# SGPR/SKIP baseline training runs (VERDICT r4 items 1, 4, 6).
set -x
cd /root/repo

while pgrep -f "queue_r5_stage2" > /dev/null; do sleep 60; done

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

echo DONE_STAGE3
