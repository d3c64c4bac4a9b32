#!/bin/bash
# r4d: restart of the 3D relative-pose run after the Inf-gradient freeze fix
# (vn_dgcnn_rich pool stop_gradient normalizer + overflow-safe grad clip).
# Fresh run dir — the frozen r4c checkpoints sit at the pathological point.
set -u
cd /root/repo
mkdir -p runs/queue_logs
echo $$ > /tmp/queue_r4.pid

log=runs/queue_logs/3d-relpose-r4d.log
for i in 1 2 3 4 5 6; do
  echo "[queue $(date +%H:%M:%S)] attempt $i" | tee -a "$log"
  if python -m diffassemble_tpu.cli.train_3d \
    --dataset synthetic --run_dir runs/quality-3d-relpose \
    --backbone vn_dgcnn_rich --max_steps 20000 --batch_size 16 \
    --num_points 256 --max_num_part 8 --min_num_part 2 \
    --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
    --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
    --wall_detail 0.06 --wall_boost 2 --synthetic_canonical 0.6 \
    --train_n 1536 --test_n 64 --deadline_margin 240 >>"$log" 2>&1; then
    echo "[queue $(date +%H:%M:%S)] ok" | tee -a "$log"; break
  fi
  tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend" || { echo "[queue] non-transient; see $log"; break; }
  sleep 60
done
echo "[queue $(date +%H:%M:%S)] done"
