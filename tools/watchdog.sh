#!/bin/bash
# Wedge watchdog for the runqueue: the axon transport can leave a training
# process blocked forever on a device call that will never return (observed:
# DiffKG froze mid-epoch 47 with zero further CPU accumulation).  Kill the
# CURRENT job's python (exact pid, never a pattern) when its log file already
# contains at least one "[Epoch" line (i.e. it is past compile — post-compile
# log gaps are bounded by epoch time, <=~150 s on every queued workload) but
# has not been written to for STALE_S seconds.  Pre-compile silence is left
# alone: cold Mosaic compiles through the tunnel legitimately take 15-20 min.
#
# Usage: bash tools/watchdog.sh <runqueue_pid> [stale_seconds]
set -u
RQ_PID=${1:?runqueue pid}
STALE_S=${2:-1200}
cd /root/repo
while kill -0 "$RQ_PID" 2>/dev/null; do
  sleep 60
  # The runqueue records "<timeout_pid> <log_path>" for the CURRENT job in
  # runs/current_job (advisor r4 finding: pgrep/newest-log heuristics could
  # kill a healthy run).  Staleness is keyed on that exact log; the victim is
  # the deepest first-child descendant of that exact pid (timeout → bash →
  # python), never a pattern match.
  [ -f runs/current_job ] || continue
  read -r to_pid log to cmd < runs/current_job || continue
  [ -n "${to_pid:-}" ] && kill -0 "$to_pid" 2>/dev/null || continue
  py_pid=$to_pid
  while c=$(pgrep -P "$py_pid" | head -1); [ -n "${c:-}" ]; do py_pid=$c; done
  [ -z "$log" ] && continue
  grep -q "\[Epoch" "$log" || continue
  age=$(( $(date +%s) - $(stat -c %Y "$log") ))
  if [ "$age" -ge "$STALE_S" ]; then
    echo "[watchdog] $(date -u +%H:%M:%S) log '$log' stale ${age}s past" \
         "first epoch; killing job pid $py_pid" >> runs/watchdog.log
    # r5 forensics: the dispatch trace's last BEGIN without a matching END
    # names the wedged device call (utils/dispatch_trace.py)
    tr="runs/dispatch_trace_${py_pid}.log"
    if [ -f "$tr" ]; then
      wedged=$(awk '$2=="BEGIN"{b=$0} $2=="END"{b=""} END{print b}' "$tr")
      echo "[watchdog]   wedged call: ${wedged:-<no unmatched BEGIN>}" \
           >> runs/watchdog.log
    fi
    kill "$py_pid" 2>/dev/null
    sleep 30
    kill -9 "$py_pid" 2>/dev/null
    # r5: auto-requeue from the last VALIDLY-saved train state (a save is
    # valid only if its "saved train state" log line was written — a kill
    # mid-save leaves a truncated msgpack, BASELINE transport-hazard note).
    # --set is last-wins, so appending resume_path overrides any earlier one.
    state=$(grep -o "saved train state to [^ ]*" "$log" | tail -1 \
            | awk '{print $5}')
    if [ -n "${state:-}" ] && [ -f "$state" ] && [ -n "${cmd:-}" ] \
        && ! grep -qF "$state" tools/queue.txt 2>/dev/null; then
      echo "$to $cmd --set train.resume_path=$state" >> tools/queue.txt
      echo "[watchdog]   requeued from $state" >> runs/watchdog.log
    fi
  fi
done
