#!/bin/bash
# Round-5 stage-2 TPU queue: the north-star production runs on the
# anisotropic sparse geometry (see analysis/QUALITY_GAP.md round-5 section),
# then the reference MVM grid completion.  Run after queue_r5_stage1.sh.
set -x
cd /root/repo

while pgrep -f "queue_r5_stage1" > /dev/null; do sleep 60; done

# North-star candidate: elevators_sparse production run, long enough for
# ARD to concentrate (300 epochs; the 100-epoch probe left inv_ell ratios
# under 10x), screening at eval via prune-thresh.
timeout 7200 python experiments/train_simplexgp.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 300 --patience 60 --prune-thresh 0.3 \
  --out runs/r5 > /tmp/r5_elevsparse.log 2>&1

# Same-data dense gold.
timeout 3600 python experiments/train_exact.py --dataset elevators_sparse \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 300 \
  --patience 60 --out runs/r5 > /tmp/r5_exact_elevsparse.log 2>&1

# Reference MVM grid completion (VERDICT r4 item 5): orders 4-5 and nu=2.5.
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_ext.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_ext.log 2>&1
timeout 5400 python experiments/sweep.py configs/mvm_err_tpu_nu25.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_nu25.log 2>&1

echo DONE_STAGE2
