#!/bin/bash
# Round-5 queue, part 6 — supersedes r5f from the flagship-dissection point
# (r5f's shell retired mid-flagship to fit the correspondence probe into the
# tail; the flagship python keeps the chip, waited on via /tmp/tpu_job.pid).
set -u
cd /root/repo
mkdir -p runs/queue_logs weights
echo $$ > /tmp/queue_r5g.pid

prev=$(cat /tmp/tpu_job.pid 2>/dev/null || true)
if [ -n "${prev:-}" ]; then
  echo "[queue $(date +%H:%M:%S)] waiting for running TPU job (pid $prev)"
  while kill -0 "$prev" 2>/dev/null; do sleep 30; done
  echo "[queue $(date +%H:%M:%S)] previous TPU job done"
  sleep 30
fi
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

NPTS=512; WBOOST=3; INIT=weights/vn_dgcnn_rich_rel3d_512.npz

if [ -d runs/quality-3d-relpose-fix/checkpoints ]; then
  rm -rf weights/diffusion3d_relpose.new
  cp -r runs/quality-3d-relpose-fix/checkpoints weights/diffusion3d_relpose.new \
    && rm -rf weights/diffusion3d_relpose \
    && mv weights/diffusion3d_relpose.new weights/diffusion3d_relpose
  echo "[queue] durable 3D rel-pose ckpt refreshed"
fi

# 1b. gauge-aligned dissection of the flagship (eval3d with corpus-matched args)
run eval3d-flagship.log 2 python scripts/tpu_eval_3d.py \
  --ckpt runs/quality-3d-relpose-fix/checkpoints --ratios 10 \
  --test_n 64 --batch 16 --num_points "$NPTS" --max_num_part 8 \
  --min_num_part 2 --wall_detail 0.06 --wall_boost "$WBOOST" \
  --canonical 0.6 --out results/diagnostics/eval3d_relpose_fix.json

# 2. 3D decodability demonstration: high-canonical corpus
run 3d-easy.log 4 python -m diffassemble_tpu.cli.train_3d \
  --dataset synthetic --run_dir runs/quality-3d-easy \
  --backbone vn_dgcnn_rich --max_steps 6000 --batch_size 16 \
  --num_points "$NPTS" --max_num_part 8 --min_num_part 2 \
  --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
  --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
  --wall_detail 0.08 --wall_boost "$WBOOST" --synthetic_canonical 0.9 \
  --encoder_init "$INIT" \
  --train_n 1536 --test_n 64 --deadline_margin 3900

if [ -d runs/quality-3d-easy/checkpoints ]; then
  rm -rf weights/diffusion3d_easy.new
  cp -r runs/quality-3d-easy/checkpoints weights/diffusion3d_easy.new \
    && rm -rf weights/diffusion3d_easy \
    && mv weights/diffusion3d_easy.new weights/diffusion3d_easy
  echo "[queue] durable 3D easy ckpt refreshed"
fi

# 3. WikiArt-hardness table
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

# 3b. correspondence-pathway probe (nn/correspondence.py, round-5 module):
# directly comparable to the pooled baselines (256 pt, rel_gd 1.4821 @4k)
run corr-probe.log 3 python scripts/tpu_pretrain_corr_rel.py \
  --steps 4000 --eval_every 500 --num_points 256 --m_points 128 \
  --max_num_part 8 --min_num_part 2 --train_objects 1536 --test_objects 64 \
  --batch_size 16 --canonical 0.6 --wall_detail 0.06 --wall_boost 2 \
  --out weights/corr_rel3d.npz --deadline_margin 3900

# 4. 30x30 flagship resume with EMA (seed from durable ckpt on fresh machine)
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

# 5. eval-protocol reconciliation sweep
run eval-sweep.log 2 python scripts/tpu_eval_sweep.py \
  --ckpt runs/quality-900c/checkpoints --ratios 10 --eval_n 64 --batch 8

echo "[queue $(date +%H:%M:%S)] queue done"
