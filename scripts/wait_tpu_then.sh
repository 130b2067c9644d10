#!/bin/bash
# Poll the TPU tunnel until a backend init succeeds, then exec the given
# command. The axon tunnel drops intermittently (backend init hangs or
# raises UNAVAILABLE); benchmarks launched through this wrapper start as
# soon as it is back instead of dying at import time.
# Usage: scripts/wait_tpu_then.sh <command...>
set -u
while true; do
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[wait_tpu] tunnel up at $(date -u +%H:%M:%S), launching: $*"
    exec "$@"
  fi
  echo "[wait_tpu] tunnel down at $(date -u +%H:%M:%S), retrying in 300s"
  sleep 300
done
