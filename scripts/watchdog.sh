#!/bin/bash
# Relaunch $1 (a python script) until $3 appears in the log; kill+restart
# (explicit PID) if no artifact progress under $4 for 6 min.  Every stage
# the supervised scripts run is idempotent-resumable, so a kill+relaunch
# only re-does the in-flight epoch.  This is the documented mitigation
# for the tunnel's silent tcp_recvmsg wedge (BENCH.md "Resilience").
SCRIPT=$1; LOG=$2; DONE_PAT=$3; WATCH_DIR=${4:-/tmp/r5}; MAX_RETRIES=60
touch "$WATCH_DIR/.hb"
for i in $(seq 1 $MAX_RETRIES); do
  echo "watchdog: launch #$i of $SCRIPT" >> "$LOG"
  python "$SCRIPT" >> "$LOG" 2>&1 &
  PID=$!
  STALL=0
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NEWEST=$(find "$WATCH_DIR" -newer "$WATCH_DIR/.hb" -type f 2>/dev/null | head -1)
    touch "$WATCH_DIR/.hb"
    if [ -z "$NEWEST" ]; then
      STALL=$((STALL+1))
    else
      STALL=0
    fi
    if [ "$STALL" -ge 6 ]; then
      echo "watchdog: stall detected, killing $PID" >> "$LOG"
      kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
      STALL=0
      break
    fi
  done
  wait $PID 2>/dev/null
  if grep -aq "$DONE_PAT" "$LOG"; then
    echo "watchdog: $DONE_PAT reached" >> "$LOG"; exit 0
  fi
  sleep 10
done
