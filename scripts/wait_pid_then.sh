#!/bin/bash
# Wait for a PID to exit, then exec the given command.
# Usage: wait_pid_then.sh <pid> <cmd...>
set -u
pid="$1"; shift
while kill -0 "$pid" 2>/dev/null; do sleep 30; done
exec "$@"
