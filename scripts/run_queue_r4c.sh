#!/bin/bash
# Round-4 endgame TPU queue, phase 3 (after run_queue_r4b.sh touches
# /tmp/queue_r4b_done): re-measure rollout (simulation) throughput.
# The round-4 fused-rollout parity fix bumped the warm solver budget
# from (10,6) to (14,6) (dair_pll_tpu/multibody/learnable_system.py),
# so the 15.43M steps/s figure in results/simulation_throughput.json is
# stale; bench_simulation.py picks the budget up from the system object.
set -u
cd /root/repo

while [ ! -f /tmp/queue_r4b_done ]; do sleep 30; done
echo "phase 3 starting $(date)" | tee /tmp/queue_r4c.log
sleep 60

echo "=== bench_simulation $(date)" | tee -a /tmp/queue_r4c.log
timeout 3600 python scripts/bench_simulation.py > /tmp/bench_sim_r4.log 2>&1
echo "bench_simulation rc=$? $(date)" | tee -a /tmp/queue_r4c.log

touch /tmp/queue_r4c_done
