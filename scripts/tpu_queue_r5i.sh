#!/bin/bash
# Round-5 queue, part 9 — the part_acc push (VERDICT r4 missing #1, final leg):
#   1. eval the 12k 3d-easy ckpt on the REGISTRABLE wall_surface corpus,
#      raw + multiview-ICP refined (models/refine3d.py) — zero-training probe
#   2. fine-tune 3d-easy 12k -> 18k ON the wall_surface corpus, durable ckpt
#   3. eval the fine-tuned ckpt raw + refined (the part_acc headline attempt)
#   4. 900c 36k -> 44k finish + EMA/protocol eval sweep (puzzle acc was 0.20
#      and climbing at 36k)
#   5. time permitting: wall-surface fine-tune 18k -> 24k + re-eval
# Waits for queue r5h (pid /tmp/queue_r5h.pid) to exit before claiming.
set -u
cd /root/repo
mkdir -p runs/queue_logs weights results/diagnostics
echo $$ > /tmp/queue_r5i.pid

# wait for r5h (and any prior claimant) to fully release the chip
prev=$(cat /tmp/queue_r5h.pid 2>/dev/null || true)
while [ -n "${prev:-}" ] && kill -0 "$prev" 2>/dev/null; do sleep 30; done
echo $$ > /tmp/queue_r5.pid   # round watchdog governs THIS pid from now on

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

NPTS=512; WBOOST=3; WFREQ=5.0
REFINE="--refine_steps 60 --refine_anchor 0.01 --refine_sigma0 0.2"

# 1. zero-training probe: 12k slab-trained ckpt on the wall_surface corpus
run eval3d-wallsurf-zero.log 3 python scripts/tpu_eval_3d.py \
  --ckpt runs/quality-3d-easy/checkpoints --ratios 10 \
  --test_n 64 --batch 16 --num_points "$NPTS" --max_num_part 8 \
  --min_num_part 2 --wall_detail 0.08 --wall_boost "$WBOOST" \
  --wall_surface 1 --wall_freq "$WFREQ" --canonical 0.9 $REFINE \
  --out results/diagnostics/eval3d_wallsurf_zeroshot.json

# 2. fine-tune on the wall_surface corpus (warm from the 12k slab ckpt)
if [ ! -d runs/quality-3d-wallsurf/checkpoints ]; then
  mkdir -p runs/quality-3d-wallsurf
  cp -r runs/quality-3d-easy/checkpoints runs/quality-3d-wallsurf/checkpoints
fi
run 3d-wallsurf.log 4 python -m diffassemble_tpu.cli.train_3d \
  --dataset synthetic --run_dir runs/quality-3d-wallsurf \
  --backbone vn_dgcnn_rich --max_steps 18000 --batch_size 16 \
  --num_points "$NPTS" --max_num_part 8 --min_num_part 2 \
  --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
  --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
  --wall_detail 0.08 --wall_boost "$WBOOST" --wall_surface 1 \
  --wall_freq "$WFREQ" --synthetic_canonical 0.9 \
  --encoder_init weights/vn_dgcnn_rich_rel3d_512.npz \
  --train_n 1536 --test_n 64 --deadline_margin 3900

if [ -d runs/quality-3d-wallsurf/checkpoints ]; then
  rm -rf weights/diffusion3d_wallsurf.new
  cp -r runs/quality-3d-wallsurf/checkpoints weights/diffusion3d_wallsurf.new \
    && rm -rf weights/diffusion3d_wallsurf \
    && mv weights/diffusion3d_wallsurf.new weights/diffusion3d_wallsurf
  echo "[queue] durable 3D wall-surface ckpt refreshed"
fi

# 3. the headline eval: fine-tuned ckpt, raw + refined
run eval3d-wallsurf-ft.log 3 python scripts/tpu_eval_3d.py \
  --ckpt runs/quality-3d-wallsurf/checkpoints --ratios 10 \
  --test_n 64 --batch 16 --num_points "$NPTS" --max_num_part 8 \
  --min_num_part 2 --wall_detail 0.08 --wall_boost "$WBOOST" \
  --wall_surface 1 --wall_freq "$WFREQ" --canonical 0.9 $REFINE \
  --out results/diagnostics/eval3d_wallsurf_ft.json

# 4. 900c finish: 36k -> 44k (+EMA), then the eval-protocol sweep
run 900c-resume.log 4 python scripts/tpu_train_device.py \
  --run_dir runs/quality-900c --hw 30 --rotation 1 \
  --backbone efficientnet_b0 --architecture exophormer --degree 10% \
  --virt_nodes 8 --n_layers 4 --batch_size 32 --train_n 1536 --eval_n 64 \
  --canonical 0.8 --hf_detail 0.25 --aux_loss_weight 0.1 \
  --encoder_init weights/efficientnet_b0_pose30hf.npz --warmup_steps 500 \
  --ema_decay 0.999 \
  --max_steps 44000 --eval_every 2000 --eval_batch 32

if [ -d runs/quality-900c/checkpoints ]; then
  rm -rf weights/diffusion2d_rot30.new
  cp -r runs/quality-900c/checkpoints weights/diffusion2d_rot30.new \
    && rm -rf weights/diffusion2d_rot30 \
    && mv weights/diffusion2d_rot30.new weights/diffusion2d_rot30
  echo "[queue] durable 900c checkpoint refreshed"
fi

run eval-sweep.log 2 python scripts/tpu_eval_sweep.py \
  --ckpt runs/quality-900c/checkpoints --ratios 10 5 --eval_n 64 --batch 8

# 5. spare chip time: push the wall-surface model further, re-eval
run 3d-wallsurf.log 2 python -m diffassemble_tpu.cli.train_3d \
  --dataset synthetic --run_dir runs/quality-3d-wallsurf \
  --backbone vn_dgcnn_rich --max_steps 24000 --batch_size 16 \
  --num_points "$NPTS" --max_num_part 8 --min_num_part 2 \
  --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
  --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
  --wall_detail 0.08 --wall_boost "$WBOOST" --wall_surface 1 \
  --wall_freq "$WFREQ" --synthetic_canonical 0.9 \
  --encoder_init weights/vn_dgcnn_rich_rel3d_512.npz \
  --train_n 1536 --test_n 64 --deadline_margin 3900

if [ -d runs/quality-3d-wallsurf/checkpoints ]; then
  rm -rf weights/diffusion3d_wallsurf.new
  cp -r runs/quality-3d-wallsurf/checkpoints weights/diffusion3d_wallsurf.new \
    && rm -rf weights/diffusion3d_wallsurf \
    && mv weights/diffusion3d_wallsurf.new weights/diffusion3d_wallsurf
fi

run eval3d-wallsurf-24k.log 2 python scripts/tpu_eval_3d.py \
  --ckpt runs/quality-3d-wallsurf/checkpoints --ratios 10 \
  --test_n 64 --batch 16 --num_points "$NPTS" --max_num_part 8 \
  --min_num_part 2 --wall_detail 0.08 --wall_boost "$WBOOST" \
  --wall_surface 1 --wall_freq "$WFREQ" --canonical 0.9 $REFINE \
  --out results/diagnostics/eval3d_wallsurf_24k.json

echo "[queue $(date +%H:%M:%S)] queue done"
