#!/usr/bin/env bash
# Generic multi-host SPMD launcher (docs/MULTIHOST.md).
# Usage: launch_multihost.sh <coordinator host:port> <num_processes> <process_id> <cmd...>
# Run the SAME command on every host with its own process_id; JAX forms the
# global device mesh over DCN (the reference's closest analog is one DDP
# process per GPU under PBS, singularity/pbs_args.sh).
set -euo pipefail
if [ $# -lt 4 ]; then
  echo "usage: $0 <coordinator host:port> <num_processes> <process_id> <cmd...>" >&2
  exit 2
fi
export DIFFASSEMBLE_COORDINATOR="$1"
export DIFFASSEMBLE_NUM_PROCESSES="$2"
export DIFFASSEMBLE_PROCESS_ID="$3"
shift 3
# parallel/distributed.initialize() consumes these before mesh construction
exec "$@"
