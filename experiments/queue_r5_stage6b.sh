#!/bin/bash
# Re-run the two elevators MVM rows lost to a file-inode race (the stale
# full-geometry-fit mixture row was filtered out while the matern job held
# an append fd to the old inode), AFTER stage-6 finishes.
set -x
cd /root/repo
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
timeout 1800 python experiments/mvm_err.py --dataset elevators --kernel mixture \
  --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
timeout 1800 python experiments/mvm_err.py --dataset elevators --kernel matern \
  --order 1 --max-exact 8192 --iters 3 >> runs/r5/mvm_mixture.jsonl 2>> /tmp/r5_mvm_mixture.log
echo DONE_STAGE6B
