#!/bin/sh
# Round-5 TPU/experiment queue — run STRICTLY SERIALLY (one TPU lease,
# one CPU core; see CLAUDE.md). Stages ordered by VERDICT-r4 value.
# Each stage is independently resumable; logs under /tmp/r5_logs.
set -x
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/r5_logs
mkdir -p "$LOG"

# 1. Kernel parity + shard_map x Pallas smoke on the real chip
#    (VERDICT weak #5). Refreshes results/tpu_kernel_parity.json.
python "$REPO"/scripts/tpu_smoke_kernel.py 4096 \
    > "$LOG"/tpu_smoke.log 2>&1 || true

# 2. Sliding-elbow recovery reconciliation (VERDICT next #1):
#    divergence-filtered data, grad clip, objective-metric selection.
python "$REPO"/scripts/elbow_recovery.py --protocol sliding \
    --epochs 300 --n-pop 128 --loss-budget 10,10 \
    --out "$REPO"/results/elbow_recovery_sliding.json \
    > "$LOG"/elbow_sliding.log 2>&1 || true

# 3. Real-cube 500-epoch three-arm battery (VERDICT next #2/#3/#6):
#    cold(10,6) flagship refresh vs cold(10,10) correctness-default
#    candidate vs warm(4,10).
python "$REPO"/scripts/warm_real_cube.py --epochs 500 \
    --eval-period 100 > "$LOG"/warm_real_cube.log 2>&1 || true

# 4. Warm-step throughput at the round-5 (4,10) warm budget.
python "$REPO"/scripts/bench_warm_step.py \
    > "$LOG"/bench_warm_step.log 2>&1 || true

# 5. Headline bench + multichip dryrun refresh.
python "$REPO"/bench.py > "$LOG"/bench.log 2>&1 || true
python "$REPO"/__graft_entry__.py > "$LOG"/graft_entry.log 2>&1 || true

# 6. MuJoCo cross-validation artifact (VERDICT next #7; CPU-bound).
python "$REPO"/examples/mujoco_cross_validation.py \
    --n-pop 32 --trajectory-length 60 --epochs 60 \
    --storage /tmp/mujoco_xval > "$LOG"/mujoco_xval.log 2>&1 || true

# 7. TPE-vs-Sobol study at equal trial budget (VERDICT next #9).
python "$REPO"/scripts/study_real_cube.py --sampler tpe \
    > "$LOG"/study_tpe.log 2>&1 || true
