#!/bin/bash
# Round-5 queue, part 3 — relaunch after the session crash at 02:00 killed
# the running queue (discrete_rot died mid-run at step 3500 with best-so-far
# 0.9952 piece / 0.8281 puzzle at step 2000). Order by value:
#
#   1. discrete_rot RESUME (auto-restores runs/quality-discrete_rot6b @3000;
#      ~9k steps ≈ 30 min) — VERDICT #4, nearly in the bag.
#   2. multisize calibration diag, now SEEDED from the durable
#      weights/diffusion2d_rot_ms ckpt (the 00:17 attempt died on the
#      missing config.json — fresh machine, runs/ is gitignored) — VERDICT #3.
#   3. 3D rel-pose run on the FIXED VN stack (_vn_leaky scale-aware floor,
#      VNNorm tanh gain cap, LR warmup 500) + rel-supervised encoder init.
#      Fresh dir. Tripwire makes a recurrence cost ~10 min — VERDICT #1.
#   4. WikiArt-hardness: art pose-pretrain then 6/8/10/12 table — VERDICT #5.
#   5. 30x30 flagship resume with --ema_decay (winds down on deadline
#      margin; absorbs whatever chip time remains) — VERDICT #6.
#   6. eval sweep reconciliation.
set -u
cd /root/repo
mkdir -p runs/queue_logs weights
echo $$ > /tmp/queue_r5.pid   # the round watchdog governs THIS pid

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
      echo "[queue] ${l}s left — standing down before attempt: $*" | tee -a "$log"
      return 1
    fi
    echo "[queue $(date +%H:%M:%S)] attempt $i: $*" | tee -a "$log"
    if "$@" >>"$log" 2>&1; then
      echo "[queue $(date +%H:%M:%S)] ok: $*" | tee -a "$log"
      return 0
    fi
    if tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend\|FAILED_PRECONDITION"; then
      echo "[queue] backend unavailable/claim race; retrying in 60s" | tee -a "$log"
      sleep 60
    else
      echo "[queue] non-transient failure; see $log" | tee -a "$log"
      return 1
    fi
  done
  echo "[queue] exhausted retries: $*" | tee -a "$log"
  return 1
}

# 1. discrete_rot resume (checkpoints @3000 present; trainer auto-restores)
run discrete-rot-full.log 6 python scripts/tpu_train_variants.py \
  --variants discrete_rot --hw 6 --run_suffix b \
  --max_steps 12000 --eval_every 1000 --batch_size 32

if [ -d runs/quality-discrete_rot6b/checkpoints ]; then
  rm -rf weights/diffusion2d_discrete_rot6.new
  cp -r runs/quality-discrete_rot6b/checkpoints weights/diffusion2d_discrete_rot6.new \
    && rm -rf weights/diffusion2d_discrete_rot6 \
    && mv weights/diffusion2d_discrete_rot6.new weights/diffusion2d_discrete_rot6
  echo "[queue] durable discrete_rot ckpt refreshed"
fi

# 2. multisize diag, seeded from the durable multisize checkpoint
if [ ! -f runs/quality-multisize/checkpoints/config.json ] && [ -d weights/diffusion2d_rot_ms ]; then
  rm -rf runs/quality-multisize/checkpoints
  mkdir -p runs/quality-multisize
  cp -r weights/diffusion2d_rot_ms runs/quality-multisize/checkpoints
  echo "[queue] seeded runs/quality-multisize/checkpoints from weights/diffusion2d_rot_ms"
fi
run diag-multisize.log 4 python scripts/tpu_diag_multisize_calib.py

# 3. 3D rel-pose on the fixed VN stack (fresh dir; warmup_steps default 500)
run 3d-relpose-fix.log 6 python -m diffassemble_tpu.cli.train_3d \
  --dataset synthetic --run_dir runs/quality-3d-relpose-fix \
  --backbone vn_dgcnn_rich --max_steps 12000 --batch_size 16 \
  --num_points 256 --max_num_part 8 --min_num_part 2 \
  --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
  --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
  --wall_detail 0.06 --wall_boost 2 --synthetic_canonical 0.6 \
  --encoder_init weights/vn_dgcnn_rich_rel3d.npz \
  --train_n 1536 --test_n 64 --deadline_margin 3900

if [ -d runs/quality-3d-relpose-fix/checkpoints ]; then
  rm -rf weights/diffusion3d_relpose.new
  cp -r runs/quality-3d-relpose-fix/checkpoints weights/diffusion3d_relpose.new \
    && rm -rf weights/diffusion3d_relpose \
    && mv weights/diffusion3d_relpose.new weights/diffusion3d_relpose
  echo "[queue] durable 3D rel-pose ckpt refreshed"
fi

# 4. WikiArt-hardness table
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

# 5. 30x30 flagship resume with EMA (seed from durable ckpt on fresh machine)
if [ ! -d runs/quality-900c/checkpoints ] && [ -d weights/diffusion2d_rot30 ]; then
  mkdir -p runs/quality-900c
  cp -r weights/diffusion2d_rot30 runs/quality-900c/checkpoints
  echo "[queue] seeded runs/quality-900c/checkpoints from weights/diffusion2d_rot30"
fi

run 900c-resume.log 4 python scripts/tpu_train_device.py \
  --run_dir runs/quality-900c --hw 30 --rotation 1 \
  --backbone efficientnet_b0 --architecture exophormer --degree 10% \
  --virt_nodes 8 --n_layers 4 --batch_size 32 --train_n 1536 --eval_n 64 \
  --canonical 0.8 --hf_detail 0.25 --aux_loss_weight 0.1 \
  --encoder_init weights/efficientnet_b0_pose30hf.npz --warmup_steps 500 \
  --ema_decay 0.999 \
  --max_steps 54000 --eval_every 2000 --eval_batch 32

if [ -d runs/quality-900c/checkpoints ]; then
  rm -rf weights/diffusion2d_rot30.new
  cp -r runs/quality-900c/checkpoints weights/diffusion2d_rot30.new \
    && rm -rf weights/diffusion2d_rot30 \
    && mv weights/diffusion2d_rot30.new weights/diffusion2d_rot30
  echo "[queue] durable 900c checkpoint refreshed"
fi

# 6. eval-protocol reconciliation sweep
run eval-sweep.log 2 python scripts/tpu_eval_sweep.py \
  --ckpt runs/quality-900c/checkpoints --ratios 10 --eval_n 64 --batch 8

echo "[queue $(date +%H:%M:%S)] queue done"
