#!/bin/bash
# Kills the round's TPU queue (shell + its direct python children, by exact
# PID — never by pattern) 65 min before the driver's round cutoff, so no
# claimant of ours competes with the driver's bench.py for the chip
# (BENCH_r03 died exactly that way). PID file: /tmp/queue_r4.pid.
set -u
deadline=$(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from diffassemble_tpu.utils.deadline import round_deadline
print(int(round_deadline()))
EOF
)
echo "[watchdog] round deadline epoch $deadline"
while :; do
  now=$(date +%s)
  left=$((deadline - now))
  if [ "$left" -le 3900 ]; then
    qpid=$(cat /tmp/queue_r5.pid 2>/dev/null || true)
    if [ -n "${qpid:-}" ] && kill -0 "$qpid" 2>/dev/null; then
      echo "[watchdog] $left s left: stopping queue $qpid and children"
      # capture the child list BEFORE killing the parent: once the parent is
      # gone the children reparent to init and ps --ppid finds nothing
      # (ADVICE r4), so a SIGTERM-ignoring claimant would survive into the
      # bench window
      kids=$(ps -o pid= --ppid "$qpid")
      for c in $kids; do kill "$c" 2>/dev/null; done
      kill "$qpid" 2>/dev/null
      sleep 5
      for c in $kids; do kill -9 "$c" 2>/dev/null; done
    else
      echo "[watchdog] $left s left: queue already stopped"
    fi
    exit 0
  fi
  sleep 60
done
