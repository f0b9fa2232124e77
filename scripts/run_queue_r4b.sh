#!/bin/bash
# Round-4 endgame TPU queue, phase 2 (after run_queue_r4.sh touches
# /tmp/queue_r4_done). Ordered by value-per-hour against the round's
# remaining wall clock: bench cache-warm sanity, the elbow rerun on the
# sliding protocol (VERDICT r3 #2 + the identifiability finding,
# results/elbow_mu_landscape_sliding.json), the rollout-throughput
# refresh at the (14,6) warm budget (the 15.43M figure predates the
# round-4 parity fix), and LAST the 2.5h full-budget multistep
# comparison (VERDICT r3 #7) — the most cuttable if the round ends.
# Strictly serial (one TPU process at a time; see CLAUDE.md).
set -u
cd /root/repo

while [ ! -f /tmp/queue_r4_done ]; do sleep 30; done
echo "phase 2 starting $(date)" | tee /tmp/queue_r4b.log
sleep 60

# Retry of the phase-1 FLOPs/VPU-utilization probe: the first attempt
# OOM'd scoped VMEM with a (512,1024) block; fixed to (128,1024).
echo "=== measure_flops retry $(date)" | tee -a /tmp/queue_r4b.log
timeout 2400 python scripts/measure_flops.py > /tmp/flops2.log 2>&1
echo "measure_flops rc=$? $(date)" | tee -a /tmp/queue_r4b.log
sleep 60

echo "=== bench.py $(date)" | tee -a /tmp/queue_r4b.log
timeout 2400 python bench.py > /tmp/bench_r4.log 2>&1
echo "bench rc=$? $(date)" | tee -a /tmp/queue_r4b.log
sleep 60

echo "=== elbow sliding $(date)" | tee -a /tmp/queue_r4b.log
timeout 5400 python scripts/elbow_recovery.py --protocol sliding \
  --epochs 200 --n-pop 128 --loss-budget 10,10 \
  --storage /tmp/elbow_sliding_storage \
  --out /root/repo/results/elbow_recovery_sliding.json \
  > /tmp/elbow_sliding.log 2>&1
echo "elbow sliding rc=$? $(date)" | tee -a /tmp/queue_r4b.log
sleep 60

echo "=== bench_simulation $(date)" | tee -a /tmp/queue_r4b.log
timeout 3600 python scripts/bench_simulation.py > /tmp/bench_sim_r4.log 2>&1
echo "bench_simulation rc=$? $(date)" | tee -a /tmp/queue_r4b.log
sleep 60

echo "=== multistep 500 epochs $(date)" | tee -a /tmp/queue_r4b.log
timeout 9000 python scripts/multistep_real_cube.py --epochs 500 \
  --t-prediction 2 --storage /tmp/multistep_real_cube_r4 \
  > /tmp/multistep_full.log 2>&1
echo "multistep rc=$? $(date)" | tee -a /tmp/queue_r4b.log

touch /tmp/queue_r4b_done
