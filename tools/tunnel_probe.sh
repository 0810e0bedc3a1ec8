#!/bin/bash
# r5: the axon relay (/root/.tpu_init.py) died at ~02:33 (port 8103 refused,
# daemon gone) leaving the chip unreachable.  Probe the relay port every 60 s
# and restart the runqueue + watchdog when the platform restores it.
set -u
cd /root/repo
while true; do
  if timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8103' 2>/dev/null; then
    echo "[probe] tunnel back at $(date -u +%H:%M:%S); starting runqueue" >> runs/runqueue.log
    nohup bash tools/runqueue.sh >> runs/runqueue.log 2>&1 &
    RQ=$!
    echo "runqueue pid $RQ" > runs/rq_pid
    nohup bash tools/watchdog.sh "$RQ" 900 > /dev/null 2>&1 &
    exit 0
  fi
  sleep 60
done
