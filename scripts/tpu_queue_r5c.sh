#!/bin/bash
# Round-4 (restarted) TPU queue C: spend whatever chip time remains after
# queues A and B on the flagship — resume the 30x30 rot recipe with EMA
# evaluation enabled (--ema_decay), chasing the >=0.98 held-out piece-acc
# target (VERDICT r3 next #8; plain resume to 54k is queue A's job 4, this
# continues it with the EMA lever). Deadline-guarded like the others.
set -u
cd /root/repo
mkdir -p runs/queue_logs

# Record our real shell PID immediately ($! after `setsid cmd &` is the
# short-lived setsid wrapper, not this shell).
echo $$ > /tmp/queue_c.pid
# Wait until EVERY pid in the queue chain is gone, re-reading the file each
# loop (waiting on a single snapshot raced queue B's startup: A's exit freed
# both at once and two claimants hit the relay together).
while :; do
  alive=0
  for p in $(cat /tmp/queue_chain.pids 2>/dev/null); do
    kill -0 "$p" 2>/dev/null && alive=1
  done
  [ "$alive" -eq 0 ] && break
  sleep 60
done
left=$(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from diffassemble_tpu.utils.deadline import time_left
print(int(time_left()))
EOF
)
if [ "${left:-0}" -le 5400 ]; then
  echo "[queueC $(date +%H:%M:%S)] only ${left}s left in round; standing down"
  exit 0
fi
echo $$ > /tmp/queue_r4.pid
echo "[queueC $(date +%H:%M:%S)] starting (pid $$, ${left}s left)"

log=runs/queue_logs/900c-ema.log
for i in 1 2 3 4; do
  echo "[queueC $(date +%H:%M:%S)] attempt $i: 900c EMA resume" | tee -a "$log"
  if python scripts/tpu_train_device.py \
      --run_dir runs/quality-900c --hw 30 --rotation 1 \
      --backbone efficientnet_b0 --architecture exophormer --degree 10% \
      --virt_nodes 8 --n_layers 4 --batch_size 32 --train_n 1536 --eval_n 64 \
      --canonical 0.8 --hf_detail 0.25 --aux_loss_weight 0.1 \
      --encoder_init weights/efficientnet_b0_pose30hf.npz --warmup_steps 500 \
      --ema_decay 0.999 --max_steps 80000 --eval_every 2000 --eval_batch 32 \
      --deadline_margin 3900 >>"$log" 2>&1; then
    echo "[queueC $(date +%H:%M:%S)] ok" | tee -a "$log"
    break
  fi
  if tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend"; then
    echo "[queueC] backend unavailable; retrying in 60s" | tee -a "$log"
    sleep 60
  else
    echo "[queueC] non-transient failure; see $log" | tee -a "$log"
    break
  fi
done

# refresh the durable copy with whatever the run reached
if [ -d runs/quality-900c/checkpoints ]; then
  rm -rf weights/diffusion2d_rot30.new
  cp -r runs/quality-900c/checkpoints weights/diffusion2d_rot30.new \
    && rm -rf weights/diffusion2d_rot30 \
    && mv weights/diffusion2d_rot30.new weights/diffusion2d_rot30
  echo "[queueC] durable 900c checkpoint refreshed"
fi
echo "[queueC $(date +%H:%M:%S)] queue done"
