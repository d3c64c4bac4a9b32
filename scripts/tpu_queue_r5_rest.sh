#!/bin/bash
# Round-5 queue, part 2 (replaces the tail of tpu_queue_r5_main.sh while its
# job 1 — the cold 3D rel-pose run — is still on the chip; a running bash
# script cannot be edited safely, so the remainder moved here, reordered).
#
# Why the reorder: the cold rel run measures 0.54 steps/s on vn_dgcnn_rich
# (8000 steps ≈ 4.1 h), so running the 4-h WARM rel run right after it (as
# r5_main did) would starve discrete_rot / WikiArt / 900c-EMA — three of the
# six VERDICT-r4 asks. New order: quick high-value jobs first, the warm rel
# run made CONDITIONAL on the cold run missing its gates, long upside last.
set -u
cd /root/repo
mkdir -p runs/queue_logs weights

# wait for the running TPU job (pid written by the swapper) to finish
prev=$(cat /tmp/tpu_job.pid 2>/dev/null || true)
if [ -n "${prev:-}" ]; then
  echo "[queue $(date +%H:%M:%S)] waiting for running TPU job (pid $prev)"
  while kill -0 "$prev" 2>/dev/null; do sleep 30; done
  echo "[queue $(date +%H:%M:%S)] previous TPU job done"
  sleep 30   # let the relay see the release before the next claim
fi
echo $$ > /tmp/queue_r5.pid   # the round watchdog governs THIS pid now

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

# did the cold rel run meet the VERDICT gates? (part_acc>0.10 AND gd<1.5)
cold_passed() {
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import json, sys
best_pa, best_gd = 0.0, 99.0
try:
    for line in open("/root/repo/runs/quality-3d-relpose-r5/metrics.jsonl"):
        m = json.loads(line)
        for k, v in m.items():
            if k.endswith("part_acc_AVG") and not k.startswith("sanity"):
                best_pa = max(best_pa, v)
            if k.endswith("gd_r_AVG") and not k.startswith("sanity"):
                best_gd = min(best_gd, v)
except FileNotFoundError:
    pass
print(f"part_acc={best_pa:.4f} gd={best_gd:.4f}", file=sys.stderr)
sys.exit(0 if (best_pa > 0.10 and best_gd < 1.5) else 1)
EOF
}

run diag-multisize.log 4 python scripts/tpu_diag_multisize_calib.py

run discrete-rot-full.log 6 python scripts/tpu_train_variants.py \
  --variants discrete_rot --hw 6 --run_suffix b \
  --max_steps 12000 --eval_every 1000 --batch_size 32

run rel-pretrain.log 6 python scripts/tpu_pretrain_encoder_3d_rel.py \
  --backbone vn_dgcnn_rich --steps 6000 --eval_every 500 \
  --num_points 256 --max_num_part 8 --min_num_part 2 \
  --train_objects 1536 --test_objects 64 --batch_size 16 \
  --canonical 0.6 --wall_detail 0.06 --wall_boost 2 \
  --out weights/vn_dgcnn_rich_rel3d.npz --deadline_margin 3900

warm_ran=0
if [ -f weights/vn_dgcnn_rich_rel3d.npz ] && ! cold_passed; then
  echo "[queue] cold rel run missed gates — running warm rel run now"
  warm_ran=1
  run 3d-relpose-warm.log 6 python -m diffassemble_tpu.cli.train_3d \
    --dataset synthetic --run_dir runs/quality-3d-relpose-warm \
    --backbone vn_dgcnn_rich --max_steps 8000 --batch_size 16 \
    --num_points 256 --max_num_part 8 --min_num_part 2 \
    --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
    --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
    --wall_detail 0.06 --wall_boost 2 --synthetic_canonical 0.6 \
    --encoder_init weights/vn_dgcnn_rich_rel3d.npz \
    --train_n 1536 --test_n 64 --deadline_margin 3900
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

# Fresh machine each round: runs/ is gitignored and empty, so "resume" must
# be seeded from the durable committed checkpoint or it restarts at step 0.
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

run eval-sweep.log 2 python scripts/tpu_eval_sweep.py \
  --ckpt runs/quality-900c/checkpoints --ratios 10 --eval_n 64 --batch 8

# filler: if the warm rel run was skipped (cold passed) and time remains,
# spend the tail of the round on it anyway — pretraining upside is free here
if [ "$warm_ran" -eq 0 ] && [ -f weights/vn_dgcnn_rich_rel3d.npz ]; then
  run 3d-relpose-warm.log 3 python -m diffassemble_tpu.cli.train_3d \
    --dataset synthetic --run_dir runs/quality-3d-relpose-warm \
    --backbone vn_dgcnn_rich --max_steps 8000 --batch_size 16 \
    --num_points 256 --max_num_part 8 --min_num_part 2 \
    --rel_pose_weight 0.5 --rel_condition 1 --contact_thresh 0.1 \
    --aux_pose_weight 0.5 --rot_pt_l2_weight 1.0 \
    --wall_detail 0.06 --wall_boost 2 --synthetic_canonical 0.6 \
    --encoder_init weights/vn_dgcnn_rich_rel3d.npz \
    --train_n 1536 --test_n 64 --deadline_margin 3900
fi

echo "[queue $(date +%H:%M:%S)] queue done"
