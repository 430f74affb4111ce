#!/bin/bash
# Round-5 stage-9: tail re-plan after the 16k dense-gold eval OOM (gold now
# n=8192, DenseGP predict block 2048).  Waits for baseline_table ($1).
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
timeout 2400 python experiments/train_exact.py --dataset precipitation \
  --max-n 8192 --kernel matern --nu 1.5 --min-noise 0.1 --ls-init median \
  --epochs 100 --patience 30 --out runs/r5 > /tmp/r5_exact_precip3.log 2>&1
timeout 2700 python experiments/quality_gap.py --dataset precipitation \
  --max-n 8192 --epochs 100 --kernel matern --ls-init median --min-noise 0.1 \
  --out runs/r5 --tag _n8192 > /tmp/qg_precip2.log 2>&1
timeout 5400 python experiments/train_simplexgp.py --dataset houseelectric \
  --kernel matern --nu 1.5 --order 1 --cg-tol 1.0 --min-noise 0.1 \
  --ls-init median --epochs 30 --log-int 10 --patience 20 \
  --plan-capacity -1 --host-loop --out runs/r5 > /tmp/r5_he.log 2>&1
echo DONE_STAGE9
