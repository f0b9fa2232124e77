#!/bin/bash
# Round-4 endgame TPU queue, phase E (after run_queue_r4d.sh touches
# /tmp/queue_r4d_done): re-run the 200-epoch sliding-protocol elbow
# recovery WITH the gradient sanitize+clip chain (grad_clip defaults to
# 1.0 for the sliding protocol since commit bd1b154). The first attempt
# diverged to non-finite parameters at epoch 1 — one inf batch gradient
# poisoned Adam's second moment (/tmp/elbow_sliding.log).
# Fresh storage dir: the old one holds a diverged checkpoint.
set -u
cd /root/repo

while [ ! -f /tmp/queue_r4d_done ]; do sleep 30; done
echo "phase E starting $(date)" | tee /tmp/queue_r4e.log
sleep 60

echo "=== elbow sliding (grad-clip) $(date)" | tee -a /tmp/queue_r4e.log
timeout 7200 python scripts/elbow_recovery.py --protocol sliding \
  --epochs 200 --n-pop 128 --loss-budget 10,10 \
  --storage /tmp/elbow_sliding_storage_r2 \
  --out /root/repo/results/elbow_recovery_sliding.json \
  > /tmp/elbow_sliding2.log 2>&1
echo "elbow sliding rc=$? $(date)" | tee -a /tmp/queue_r4e.log

touch /tmp/queue_r4e_done
