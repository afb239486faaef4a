#!/bin/bash
# Stall watchdog for long TPU runs over the remote-worker tunnel: the
# worker occasionally hangs a client mid-RPC (observed twice on 2h-scale
# runs); the client then blocks forever at 0% CPU. Restarting the
# process is safe — the driver elastic-restores from the latest
# checkpoint in its save dir (pretrain re-runs only if the run never
# reached its post-pretrain checkpoint).
#
# Usage: watchdog.sh <run_script.py> <save_dir> <log_file> [stall_secs]
set -u
SCRIPT=$1
SAVE=$2
LOG=$3
STALL=${4:-900}

while true; do
  python "$SCRIPT" "$SAVE" >> "$LOG" 2>&1 &
  PID=$!
  echo "watchdog: started $SCRIPT pid=$PID" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    if [ -f "$LOG" ]; then
      AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$AGE" -gt "$STALL" ]; then
        echo "watchdog: log stale ${AGE}s, restarting" >> "$LOG"
        kill -9 "$PID" 2>/dev/null
        sleep 10
        break
      fi
    fi
  done
  # normal exit (run completed) -> stop; otherwise loop relaunches
  if ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID" 2>/dev/null
    RC=$?
    if [ "$RC" -eq 0 ]; then
      echo "watchdog: run completed rc=0" >> "$LOG"
      exit 0
    fi
    echo "watchdog: run exited rc=$RC, restarting in 30s" >> "$LOG"
    sleep 30
  fi
done
