#!/bin/bash
# Short-window watchdog: backstop for the r4c queue. The Trainer's own
# deadline guard winds down 300 s before the cutoff; this only fires if a
# process hangs (e.g. stuck in an axon claim). Re-reads the live deadline
# (.deadline_epoch via utils/deadline.py) every loop so mid-run extensions
# by the builder are honored. Kills by exact PID from /tmp/queue_r4.pid —
# never by pattern.
set -u
while :; do
  left=$(env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<'EOF'
import sys; sys.path.insert(0, "/root/repo")
from diffassemble_tpu.utils.deadline import time_left
print(int(time_left()))
EOF
)
  if [ "$left" -le 60 ]; then
    qpid=$(cat /tmp/queue_r4.pid 2>/dev/null || true)
    if [ -n "${qpid:-}" ] && kill -0 "$qpid" 2>/dev/null; then
      echo "[watchdog] ${left}s left: stopping queue $qpid and children"
      for c in $(ps -o pid= --ppid "$qpid"); do kill "$c" 2>/dev/null; done
      kill "$qpid" 2>/dev/null
      sleep 5
      for c in $(ps -o pid= --ppid "$qpid" 2>/dev/null); do kill -9 "$c" 2>/dev/null; done
    else
      echo "[watchdog] ${left}s left: queue already stopped"
    fi
    exit 0
  fi
  sleep 30
done
