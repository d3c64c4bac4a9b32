#!/bin/bash
# Round-5 queue, part 9a — ONLY the wall-surface fine-tune (12k -> 18k), so
# the chip stays busy while the refine3d hyper-params are still being tuned
# on CPU. Evals + 900c finish follow in tpu_queue_r5i.sh (waits on this pid).
set -u
cd /root/repo
mkdir -p runs/queue_logs weights results/diagnostics
echo $$ > /tmp/queue_r5i_ft.pid

prev=$(cat /tmp/queue_r5h.pid 2>/dev/null || true)
while [ -n "${prev:-}" ] && kill -0 "$prev" 2>/dev/null; do sleep 30; done
echo $$ > /tmp/queue_r5.pid   # round watchdog governs THIS pid now

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
      echo "[queue] ${l}s left — standing down: $*" | tee -a "$log"
      return 1
    fi
    echo "[queue $(date +%H:%M:%S)] attempt $i: $*" | tee -a "$log"
    if "$@" >>"$log" 2>&1; then
      echo "[queue $(date +%H:%M:%S)] ok: $*" | tee -a "$log"
      return 0
    fi
    if tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend\|FAILED_PRECONDITION"; then
      echo "[queue] backend unavailable; retrying in 60s" | tee -a "$log"
      sleep 60
    else
      echo "[queue] non-transient failure; see $log" | tee -a "$log"
      return 1
    fi
  done
  return 1
}

NPTS=512; WBOOST=3; WFREQ=5.0

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
echo "[queue $(date +%H:%M:%S)] ft queue done"
