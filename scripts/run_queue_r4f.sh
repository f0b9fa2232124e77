#!/bin/bash
# Round-4 endgame TPU queue, phase F (after run_queue_r4e.sh touches
# /tmp/queue_r4e_done): quantify the epoch-warm loss path on the chip.
#  1. measure_flops.py — re-measure the VPU-peak probe with 32 ILP
#     chains (the 8-chain probe under-measured peak, yielding an
#     impossible 182% utilization figure).
#  2. bench_warm_step.py — steady-state epoch-warm train-step
#     throughput at the battery-validated budget (arg override:
#     WARM_BUDGET="ipm newton").
#  3. warm_real_cube.py — end-to-end warm-vs-cold 500-epoch training on
#     the real 550 tosses (parameter recovery parity + wall split).
#  4. bench.py — refresh the headline + bench_detail.json.
set -u
cd /root/repo

while [ ! -f /tmp/queue_r4e_done ]; do sleep 30; done
echo "phase F starting $(date)" | tee /tmp/queue_r4f.log
sleep 60

echo "=== measure_flops $(date)" | tee -a /tmp/queue_r4f.log
timeout 1800 python scripts/measure_flops.py \
  > /tmp/measure_flops_r4f.log 2>&1
echo "measure_flops rc=$? $(date)" | tee -a /tmp/queue_r4f.log

echo "=== bench_warm_step $(date)" | tee -a /tmp/queue_r4f.log
timeout 3600 python scripts/bench_warm_step.py ${WARM_BUDGET:-} \
  > /tmp/bench_warm_step.log 2>&1
echo "bench_warm_step rc=$? $(date)" | tee -a /tmp/queue_r4f.log

echo "=== warm_real_cube $(date)" | tee -a /tmp/queue_r4f.log
timeout 7200 python scripts/warm_real_cube.py --epochs 500 \
  > /tmp/warm_real_cube.log 2>&1
echo "warm_real_cube rc=$? $(date)" | tee -a /tmp/queue_r4f.log

echo "=== bench $(date)" | tee -a /tmp/queue_r4f.log
timeout 3600 python bench.py > /tmp/bench_r4f.log 2>&1
echo "bench rc=$? $(date)" | tee -a /tmp/queue_r4f.log

touch /tmp/queue_r4f_done
