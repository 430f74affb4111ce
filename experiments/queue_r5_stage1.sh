#!/bin/bash
# Round-5 stage-1 TPU job queue (serialized: one chip).  VERDICT r4 items
# 1-3: the canonical elevators re-run on the fixed engine, the
# elevators_clustered production run + same-data dense gold, and the
# clustered-geometry MVM rows.  Run AFTER the quality_gap job finishes.
set -x
cd /root/repo

# Wait for any currently-running quality_gap job to release the chip.
while pgrep -f "quality_gap.py" > /dev/null; do sleep 30; done

# 0) apply-variant timing (picks the formulation that fixes the 8-rhs
#    regression; runs/r5/opt_apply.jsonl).
timeout 1800 python experiments/opt_apply.py > /tmp/r5_opt_apply.log 2>&1

# 0b) quality-gap 2x2 on the ANISOTROPIC sparse variant with ARD screening
#     (the north-star candidate geometry; see utils/data.py `_sparse`).
timeout 3600 python experiments/quality_gap.py --dataset elevators_sparse \
  --max-n 8192 --epochs 100 --kernel matern --ls-init median --min-noise 0.1 \
  --prune-thresh 0.1 --out runs/r5 --tag _n8192 > /tmp/qg_elevsparse.log 2>&1

# 3) canonical elevators re-run (reference configs/simplexgp.yml settings),
#    now with mean-residual stopping + stall guard actually in the binary.
timeout 3600 python experiments/train_simplexgp.py --dataset elevators \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 100 --out runs/r5 > /tmp/r5_elev.log 2>&1

# 1) production run on the clustered geometry (the north-star candidate).
timeout 3600 python experiments/train_simplexgp.py --dataset elevators_clustered \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 100 --out runs/r5 > /tmp/r5_elevclus.log 2>&1

# Same-data dense gold standards for both runs.
timeout 2400 python experiments/train_exact.py --dataset elevators_clustered \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 100 \
  --out runs/r5 > /tmp/r5_exact_elevclus.log 2>&1
timeout 2400 python experiments/train_exact.py --dataset elevators \
  --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median --epochs 100 \
  --out runs/r5 > /tmp/r5_exact_elev.log 2>&1

# 2a) clustered-geometry MVM accuracy rows.
timeout 3600 python experiments/sweep.py configs/mvm_err_clustered.yml \
  --out runs/sweep_mvm_err_tpu > /tmp/r5_mvm_clustered.log 2>&1

echo DONE_STAGE1
