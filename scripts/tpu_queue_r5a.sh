#!/bin/bash
# Round-4 TPU queue (combined, priority-ordered). The axon relay was
# unavailable for >1.5 h at round start, so jobs are ordered by judge value —
# if the chip comes back late, the high-value work still lands first:
#
#   1. 3D relative-pose quality run (VERDICT r3 next #2 — part_acc > 0);
#   2. full-length discrete_rot cold diffusion (next #4);
#   3. multi-size calibration diagnosis (next #6, ~20 min);
#   4. 30x30 flagship resume toward >=0.98 (next #8; the committed 30k
#      checkpoint already satisfies bench's >=0.95 criterion, so this is
#      upside, deadline-guarded to stop 60 min before the round cutoff);
#   5. WikiArt-hardness pretrain + multi-size table (next #9);
#   6. eval sweep with the stage-split timing (weak #2 reconciliation).
#
# One TPU claim at a time; each job retries through relay-unavailable windows.
set -u
cd /root/repo
mkdir -p runs/queue_logs
echo $$ > /tmp/queue_r5.pid   # watchdog kills by THIS pid (never by pattern)

# seconds until the driver's round cutoff (PROGRESS heuristic; stale
# .deadline_epoch overrides are ignored by deadline.py as of round 5)
left() {
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from diffassemble_tpu.utils.deadline import time_left
print(int(time_left()))
EOF
}

run() {
  local log="runs/queue_logs/$1"; shift
  local tries="$1"; shift
  for i in $(seq 1 "$tries"); do
    local l; l=$(left)
    if [ "$l" -le 4200 ]; then
      # never CLAIM inside the 70-min pre-bench window: a grant (5-10 min)
      # plus compile would land squarely on the driver's chip time
      echo "[queue] $l s left — standing down before attempt: $*" | tee -a "$log"
      return 1
    fi
    echo "[queue $(date +%H:%M:%S)] attempt $i: $*" | tee -a "$log"
    if "$@" >>"$log" 2>&1; then
      echo "[queue $(date +%H:%M:%S)] ok: $*" | tee -a "$log"
      return 0
    fi
    if tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend"; then
      echo "[queue] backend unavailable; retrying in 60s" | tee -a "$log"
      sleep 60
    else
      echo "[queue] non-transient failure; see $log" | tee -a "$log"
      return 1
    fi
  done
  echo "[queue] exhausted retries: $*" | tee -a "$log"
  return 1
}

run 3d-relpose.log 20 python -m diffassemble_tpu.cli.train_3d \
  --dataset synthetic --run_dir runs/quality-3d-relpose \
  --backbone vn_dgcnn_rich --max_steps 8000 --batch_size 16 \
  --num_points 256 --max_num_part 8 --min_num_part 2 \
  --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
  --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
  --wall_detail 0.06 --wall_boost 2 --synthetic_canonical 0.6 \
  --train_n 1536 --test_n 64 --deadline_margin 3600

run discrete-rot-full.log 6 python scripts/tpu_train_variants.py \
  --variants discrete_rot --hw 6 --run_suffix b \
  --max_steps 12000 --eval_every 1000 --batch_size 32

run diag-multisize.log 4 python scripts/tpu_diag_multisize_calib.py

run 900c-resume.log 4 python scripts/tpu_train_device.py \
  --run_dir runs/quality-900c --hw 30 --rotation 1 \
  --backbone efficientnet_b0 --architecture exophormer --degree 10% \
  --virt_nodes 8 --n_layers 4 --batch_size 32 --train_n 1536 --eval_n 64 \
  --canonical 0.8 --hf_detail 0.25 --aux_loss_weight 0.1 \
  --encoder_init weights/efficientnet_b0_pose30hf.npz --warmup_steps 500 \
  --max_steps 54000 --eval_every 2000 --eval_batch 32

# durable copy of whatever the 900c resume reached
if [ -d runs/quality-900c/checkpoints ]; then
  rm -rf weights/diffusion2d_rot30.new
  cp -r runs/quality-900c/checkpoints weights/diffusion2d_rot30.new \
    && rm -rf weights/diffusion2d_rot30 \
    && mv weights/diffusion2d_rot30.new weights/diffusion2d_rot30
  echo "[queue] durable 900c checkpoint refreshed"
fi

run art-pretrain.log 3 python scripts/tpu_pretrain_encoder.py \
  --backbone resnet18equiv --hw 6 --style art --canonical 0.1 \
  --steps 6000 --train_n 2000

run art-multisize.log 3 python scripts/tpu_train_device.py \
  --run_dir runs/quality-art-ms --hw 6 8 10 12 --rotation 1 \
  --backbone resnet18equiv --architecture exophormer --degree -1 \
  --style art --canonical 0.1 --batch_size 16 --train_n 4000 --eval_n 64 \
  --aux_loss_weight 0.1 --warmup_steps 500 \
  --encoder_init weights/resnet18equiv_pose6art.npz \
  --max_steps 12000 --eval_every 1500 --eval_batch 16

run eval-sweep.log 2 python scripts/tpu_eval_sweep.py \
  --ckpt runs/quality-900c/checkpoints --ratios 10 --eval_n 64 --batch 8

echo "[queue $(date +%H:%M:%S)] queue done"
