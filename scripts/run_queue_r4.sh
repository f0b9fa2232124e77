#!/bin/bash
# Round-4 endgame TPU queue: waits for the running elbow job to release
# the chip, then runs the FLOPs/VPU-utilization quantification and the
# forced-fused ICNN mesh-cube run, strictly serially (one TPU process at
# a time; see CLAUDE.md).
set -u
cd /root/repo

ELBOW_PID=$(cat /tmp/elbow_full.pid)
while kill -0 "$ELBOW_PID" 2>/dev/null; do sleep 30; done
echo "elbow run (pid $ELBOW_PID) finished at $(date)" | tee /tmp/queue_r4.log
sleep 90   # let the tunneled TPU lease free cleanly

echo "=== measure_flops $(date)" | tee -a /tmp/queue_r4.log
timeout 2400 python scripts/measure_flops.py > /tmp/flops.log 2>&1
echo "measure_flops rc=$? $(date)" | tee -a /tmp/queue_r4.log
sleep 60

echo "=== mesh_real_cube --force-fused $(date)" | tee -a /tmp/queue_r4.log
timeout 5400 python scripts/mesh_real_cube.py --force-fused \
  --storage /tmp/mesh_real_cube_r4 --out cube_mesh_r4_fused.json \
  > /tmp/mesh_fused.log 2>&1
echo "mesh fused rc=$? $(date)" | tee -a /tmp/queue_r4.log

touch /tmp/queue_r4_done
