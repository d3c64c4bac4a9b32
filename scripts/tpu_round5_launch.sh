#!/bin/bash
# Round-5 launcher. The round-4→5 boundary is owned by the driver: it runs
# bench.py (needs the chip) and the judge before writing the first round-5
# PROGRESS.jsonl entry. Launching the queue before that entry appears is
# doubly wrong: (a) our claim would race the driver's bench, and (b)
# utils/deadline.py would still report the ROUND-4 cutoff (already passed),
# so every deadline-guarded job would wind down immediately.
#
# So: poll PROGRESS.jsonl until a `"round": 5` entry exists (that also
# implies bench_r04 is done), then start tpu_queue_r5a.sh with its PID in
# /tmp/queue_r4.pid and the round watchdog alongside.
set -u
cd /root/repo
mkdir -p runs/queue_logs
log=runs/queue_logs/r5_launch.log
echo "[launch $(date +%H:%M:%S)] waiting for round-5 PROGRESS entry" | tee -a "$log"
while :; do
  last=$(tail -1 PROGRESS.jsonl 2>/dev/null || true)
  case "$last" in
    *'"round": 5'*|*'"round":5'*)
      echo "[launch $(date +%H:%M:%S)] round 5 detected: $last" | tee -a "$log"
      break;;
  esac
  sleep 60
done
# small settle so the axon relay has released the driver's bench claim
sleep 120
setsid bash scripts/tpu_queue_r5a.sh >> runs/queue_logs/r5_master.log 2>&1 &
echo $! > /tmp/queue_r4.pid
echo "[launch $(date +%H:%M:%S)] queue started pid $(cat /tmp/queue_r4.pid)" | tee -a "$log"
setsid bash scripts/tpu_round_watchdog.sh >> runs/queue_logs/watchdog_r5.log 2>&1 &
echo "[launch $(date +%H:%M:%S)] watchdog started pid $!" | tee -a "$log"
