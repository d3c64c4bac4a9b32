#!/bin/bash
# Round-4 (restarted, SHORT ~1 h window) TPU queue. One claim at a time,
# priority-ordered, every job bounded by the live deadline file
# /root/repo/.deadline_epoch (utils/deadline.py reads it on every check, so
# the builder can extend the window mid-run without restarting anything).
#
#   1. 3D relative-pose quality run on vn_dgcnn_rich (VERDICT r3 next #2 —
#      the one capability-level gap: part_acc > 0). Deadline-guarded; it
#      winds down with a final eval + checkpoint whenever the window closes.
#   2. (only if time remains) multi-size calibration diagnosis (next #6).
#   3. (only if time remains) stage-split eval sweep (weak #2).
set -u
cd /root/repo
mkdir -p runs/queue_logs
echo $$ > /tmp/queue_r4.pid

left() {
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import sys; sys.path.insert(0, "/root/repo")
from diffassemble_tpu.utils.deadline import time_left
print(int(time_left()))
EOF
}

run() {
  local log="runs/queue_logs/$1"; shift
  local tries="$1"; shift
  for i in $(seq 1 "$tries"); do
    if [ "$(left)" -le 480 ]; then
      echo "[queue] <480s left; not starting: $*" | tee -a "$log"; return 1
    fi
    echo "[queue $(date +%H:%M:%S)] attempt $i: $*" | tee -a "$log"
    if "$@" >>"$log" 2>&1; then
      echo "[queue $(date +%H:%M:%S)] ok: $*" | tee -a "$log"; return 0
    fi
    if tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend"; then
      echo "[queue] backend unavailable; retrying in 60s" | tee -a "$log"
      sleep 60
    else
      echo "[queue] non-transient failure; see $log" | tee -a "$log"; return 1
    fi
  done
  echo "[queue] exhausted retries: $*" | tee -a "$log"; return 1
}

run 3d-relpose.log 8 python -m diffassemble_tpu.cli.train_3d \
  --dataset synthetic --run_dir runs/quality-3d-relpose \
  --backbone vn_dgcnn_rich --max_steps 20000 --batch_size 16 \
  --num_points 256 --max_num_part 8 --min_num_part 2 \
  --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
  --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
  --wall_detail 0.06 --wall_boost 2 --synthetic_canonical 0.6 \
  --train_n 1536 --test_n 64 --deadline_margin 300

if [ "$(left)" -gt 1500 ]; then
  run diag-multisize.log 3 python scripts/tpu_diag_multisize_calib.py
fi
if [ "$(left)" -gt 900 ]; then
  run eval-sweep.log 2 python scripts/tpu_eval_sweep.py \
    --ckpt weights/diffusion2d_rot30 --ratios 10 --eval_n 64 --batch 8
fi
echo "[queue $(date +%H:%M:%S)] queue done with $(left)s left"
