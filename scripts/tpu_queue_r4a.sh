#!/bin/bash
# Round-4 TPU queue A — the two runs that need no new model code, executed
# serially in one shell so the chip is claimed/released one process at a time
# (CLAUDE.md: concurrent claims deadlock; re-claims take 5-10 min).
#
#   1. resume the 30x30 flagship (quality-900c, 96.26% @ step 30k) at batch 32
#      to push held-out piece acc toward >=0.98 (VERDICT r3 next #8);
#   2. full-length discrete_rot cold-diffusion run (VERDICT r3 next #4 —
#      round 3's was truncated at ~3k steps with puzzle acc 0.3125).
#
# Each job retries on transient axon claim failures (UNAVAILABLE right after
# the previous process exits) and gives up fast on real errors. The python
# scripts carry their own round-deadline guard (utils/deadline.py).
set -u
cd /root/repo
mkdir -p runs/queue_logs

run() {
  local log="runs/queue_logs/$1"; shift
  for i in $(seq 1 12); do
    echo "[queue $(date +%H:%M:%S)] attempt $i: $*" | tee -a "$log"
    if "$@" >>"$log" 2>&1; then
      echo "[queue $(date +%H:%M:%S)] ok: $*" | tee -a "$log"
      return 0
    fi
    if tail -50 "$log" | grep -q "UNAVAILABLE\|Unable to initialize backend"; then
      echo "[queue] backend unavailable (claim cycle); retrying in 60s" | tee -a "$log"
      sleep 60
    else
      echo "[queue] non-transient failure rc=$?; see $log" | tee -a "$log"
      return 1
    fi
  done
  echo "[queue] exhausted retries for: $*" | tee -a "$log"
  return 1
}

run 900c-resume.log python scripts/tpu_train_device.py \
  --run_dir runs/quality-900c --hw 30 --rotation 1 \
  --backbone efficientnet_b0 --architecture exophormer --degree 10% \
  --virt_nodes 8 --n_layers 4 --batch_size 32 --train_n 1536 --eval_n 64 \
  --canonical 0.8 --hf_detail 0.25 --aux_loss_weight 0.1 \
  --encoder_init weights/efficientnet_b0_pose30hf.npz --warmup_steps 500 \
  --max_steps 54000 --eval_every 2000 --eval_batch 32

run discrete-rot-full.log python scripts/tpu_train_variants.py \
  --variants discrete_rot --hw 6 --run_suffix b \
  --max_steps 12000 --eval_every 1000 --batch_size 32

echo "[queue $(date +%H:%M:%S)] queue A done"
