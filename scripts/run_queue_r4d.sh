#!/bin/bash
# Round-4 endgame TPU queue, phase D (after run_queue_r4b.sh touches
# /tmp/queue_r4b_done): short NON-fused ICNN run to measure the vmapped
# steady-state epoch time — the denominator of the ICNN fast-path
# speedup claim (results/cube_mesh_r4_fused.json measured the fused
# path at ~0.07 s/epoch; the r3 1627 s wall was dominated by rendering
# + compile, so the old artifact cannot serve as the denominator).
# No evaluation epochs: we only want training_duration rows.
set -u
cd /root/repo

while [ ! -f /tmp/queue_r4b_done ]; do sleep 30; done
echo "phase D starting $(date)" | tee /tmp/queue_r4d.log
sleep 60

echo "=== mesh_real_cube non-fused short $(date)" | tee -a /tmp/queue_r4d.log
timeout 3600 python scripts/mesh_real_cube.py --epochs 12 \
  --eval-period 1000 --eval-samples 0 \
  --storage /tmp/mesh_real_cube_r4_vmapped --out cube_mesh_r4_vmapped_short.json \
  > /tmp/mesh_vmapped.log 2>&1
echo "mesh vmapped rc=$? $(date)" | tee -a /tmp/queue_r4d.log
sleep 60

# Re-run the FLOPs/utilization probe with the vreg-resident VPU-peak
# kernel (the VMEM-array-chain probe measured 1.55 TF/s, below the
# fused kernel's own 3.08 TF/s — not a ceiling).
echo "=== measure_flops vreg probe $(date)" | tee -a /tmp/queue_r4d.log
timeout 2400 python scripts/measure_flops.py > /tmp/flops3.log 2>&1
echo "measure_flops rc=$? $(date)" | tee -a /tmp/queue_r4d.log

touch /tmp/queue_r4d_done
