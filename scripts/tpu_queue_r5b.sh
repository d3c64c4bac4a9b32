#!/bin/bash
# Round-4 (restarted) TPU queue B: the rel-supervised PRETRAIN recipe.
#
# Runs after tpu_queue_r5a.sh finishes (polls its PID from /tmp/queue_r4.pid,
# then takes the PID file over so the round watchdog governs this queue too).
# Rationale: queue A's job 1 gives the "rich pooling, cold start" datapoint;
# this queue gives "rich pooling + rel-supervised pretraining" — the 2D
# recipe's winning structure (pose-pretrain the encoder, then diffuse) applied
# to the 3D relative-pose pathway. Oracle test showed the head generalizes at
# rel-gd 0.077 when features carry the signal; pretraining optimizes the
# encoder for exactly that signal before diffusion training starts.
set -u
cd /root/repo
mkdir -p runs/queue_logs weights

prev=$(cat /tmp/queue_r4.pid 2>/dev/null || true)
if [ -n "${prev:-}" ]; then
  echo "[queueB $(date +%H:%M:%S)] waiting for queue A (pid $prev) to finish"
  while kill -0 "$prev" 2>/dev/null; do sleep 60; done
fi
# Never start inside the driver's bench window: if less than ~70 min remain
# when queue A finishes, stand down (the watchdog would otherwise only govern
# whichever PID is in the file at its firing instant).
left=$(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from diffassemble_tpu.utils.deadline import time_left
print(int(time_left()))
EOF
)
if [ "${left:-0}" -le 4200 ]; then
  echo "[queueB $(date +%H:%M:%S)] only ${left}s left in round; standing down"
  exit 0
fi
echo $$ > /tmp/queue_r4.pid
echo "[queueB $(date +%H:%M:%S)] queue A done; starting (pid $$, ${left}s left)"

run() {
  local log="runs/queue_logs/$1"; shift
  local tries="$1"; shift
  for i in $(seq 1 "$tries"); do
    echo "[queueB $(date +%H:%M:%S)] attempt $i: $*" | tee -a "$log"
    if "$@" >>"$log" 2>&1; then
      echo "[queueB $(date +%H:%M:%S)] ok: $*" | tee -a "$log"
      return 0
    fi
    if tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend"; then
      echo "[queueB] backend unavailable; retrying in 60s" | tee -a "$log"
      sleep 60
    else
      echo "[queueB] non-transient failure; see $log" | tee -a "$log"
      return 1
    fi
  done
  echo "[queueB] exhausted retries: $*" | tee -a "$log"
  return 1
}

run rel-pretrain.log 6 python scripts/tpu_pretrain_encoder_3d_rel.py \
  --backbone vn_dgcnn_rich --steps 6000 --eval_every 500 \
  --num_points 256 --max_num_part 8 --min_num_part 2 \
  --train_objects 1536 --test_objects 64 --batch_size 16 \
  --canonical 0.6 --wall_detail 0.06 --wall_boost 2 \
  --out weights/vn_dgcnn_rich_rel3d.npz --deadline_margin 3900

if [ -f weights/vn_dgcnn_rich_rel3d.npz ]; then
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

echo "[queueB $(date +%H:%M:%S)] queue done"
