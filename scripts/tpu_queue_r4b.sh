#!/bin/bash
# Round-4 TPU queue B — starts when queue A's shell exits (one TPU claim at a
# time, CLAUDE.md), then runs the round's model-code-dependent jobs serially:
#
#   1. multi-size eval-oscillation diagnosis (VERDICT r3 next #6):
#      batch-stats vs calibrated OrientationNorm, per size, two batch sizes;
#   2. 3D relative-pose quality run (VERDICT r3 next #2 — the part_acc>0
#      target): vn_dgcnn + RelPoseHead consensus conditioning + corrugated
#      walls; Trainer's deadline guard winds it down before the bench window;
#   3. WikiArt-hardness pipeline (VERDICT r3 next #9): pose-pretrain the
#      equivariant encoder on the art corpus, then the multi-size recipe on
#      it with whatever time remains.
#
# Afterwards the best 900c checkpoint is copied to weights/ (durable across
# rounds; runs/ is wiped).
set -u
cd /root/repo
mkdir -p runs/queue_logs

if [ -f /tmp/queue_r4a.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4a.pid)" 2>/dev/null; do sleep 60; done
fi
echo "[queueB $(date +%H:%M:%S)] queue A done; starting B"

run() {
  local log="runs/queue_logs/$1"; shift
  for i in $(seq 1 12); do
    echo "[queueB $(date +%H:%M:%S)] attempt $i: $*" | tee -a "$log"
    if "$@" >>"$log" 2>&1; then
      echo "[queueB $(date +%H:%M:%S)] ok: $*" | tee -a "$log"
      return 0
    fi
    if tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend"; then
      echo "[queueB] backend unavailable (claim cycle); retrying in 60s" | tee -a "$log"
      sleep 60
    else
      echo "[queueB] non-transient failure; see $log" | tee -a "$log"
      return 1
    fi
  done
  return 1
}

# durable copy of the resumed 30x30 flagship (best-k checkpoints only, ~20 MB)
if [ -d runs/quality-900c/checkpoints ]; then
  rm -rf weights/diffusion2d_rot30.new
  cp -r runs/quality-900c/checkpoints weights/diffusion2d_rot30.new \
    && rm -rf weights/diffusion2d_rot30 \
    && mv weights/diffusion2d_rot30.new weights/diffusion2d_rot30
  echo "[queueB] durable 900c checkpoint refreshed"
fi

run diag-multisize.log python scripts/tpu_diag_multisize_calib.py

run 3d-relpose.log python -m diffassemble_tpu.cli.train_3d \
  --dataset synthetic --run_dir runs/quality-3d-relpose \
  --backbone vn_dgcnn --max_steps 6000 --batch_size 16 \
  --num_points 256 --max_num_part 8 --min_num_part 2 \
  --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
  --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
  --wall_detail 0.06 --wall_boost 2 --synthetic_canonical 0.6 \
  --train_n 512 --test_n 64 --deadline_margin 3600

run art-pretrain.log python scripts/tpu_pretrain_encoder.py \
  --backbone resnet18equiv --hw 6 --style art --canonical 0.1 \
  --steps 6000 --train_n 2000

run art-multisize.log python scripts/tpu_train_device.py \
  --run_dir runs/quality-art-ms --hw 6 8 10 12 --rotation 1 \
  --backbone resnet18equiv --architecture exophormer --degree -1 \
  --style art --canonical 0.1 --batch_size 16 --train_n 4000 --eval_n 64 \
  --aux_loss_weight 0.1 --warmup_steps 500 \
  --encoder_init weights/resnet18equiv_pose6art.npz \
  --max_steps 12000 --eval_every 1500 --eval_batch 16

echo "[queueB $(date +%H:%M:%S)] queue B done"
