#!/bin/bash
# Canonical 1-scale YOLO convergence recipe (CONVERGENCE.md row
# "YOLO canonical").  Trains conf/exp/yolo.conf — the reference's
# detection operating point (/root/reference/conf/exp/yolo.conf: custom
# 1792-d backbone, 128 coarse samples, V=3) — on a regenerated synthetic
# set, then scores latest + best-F1 checkpoints with eval/eval_yolo.py
# (P/R/F1 + mAP@0.5).
#
#   bash scripts/convergence_yolo.sh [workdir] [epochs]
#
# Runs on whatever backend jax exposes (the chip, under axon).
set -eu
# Relay-wedge guard: an unattended chip run can block forever on a dead
# device call (observed r4: a client wedged 22+ min mid-epoch).  The
# stall watchdog aborts the process so the wall-clock is bounded;
# override or empty to disable.
export PNY_STALL_ABORT_S=${PNY_STALL_ABORT_S:-900}
WORK=${1:-/tmp/yolo1s}
EPOCHS=${2:-24}
REPO=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$WORK"
cd "$WORK"

python - <<EOF
import sys
sys.path.insert(0, "$REPO/tests")
from synth_data import make_yolo_dataset
make_yolo_dataset("$WORK/data", n_scenes=2, n_views=10, img_size=256,
                  seed=4)
print("dataset at $WORK/data")
EOF

python "$REPO/train/train.py" -n yolo1s --dataset_format yolo \
  -c "$REPO/conf/exp/yolo.conf" -D "$WORK/data" \
  -V 3 -B 1 --gamma 0.9 --epochs "$EPOCHS" \
  --logs_path "$WORK/logs" --checkpoints_path "$WORK/checkpoints" \
  --visual_path "$WORK/visuals"

run_eval() {
  python "$REPO/eval/eval_yolo.py" -n yolo1s --dataset_format yolo \
    -c "$REPO/conf/exp/yolo.conf" -D "$WORK/data" \
    --checkpoints_path "$WORK/checkpoints"
}
echo "=== eval_yolo (latest checkpoint) ==="
run_eval
CKPT="$WORK/checkpoints/yolo1s"
if [ -f "$CKPT/pixel_nerf_backup_best" ]; then
  echo "=== eval_yolo (best-F1 checkpoint) ==="
  cp "$CKPT/pixel_nerf_latest" "$CKPT/pixel_nerf_latest.bak"
  # always restore the real latest, even when the eval fails under set -e
  trap 'mv -f "$CKPT/pixel_nerf_latest.bak" "$CKPT/pixel_nerf_latest"' EXIT
  cp "$CKPT/pixel_nerf_backup_best" "$CKPT/pixel_nerf_latest"
  run_eval
fi
