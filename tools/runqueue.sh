#!/bin/bash
# Sequential TPU job queue: pops one line at a time from tools/queue.txt and
# runs it. Each line: <timeout_seconds> <command...>. Lines can be appended or
# re-ordered while the runner is live. Stdout per job goes to runs/<n>_<tag>.log.
set -u
cd /root/repo
mkdir -p runs
# continue numbering from prior runqueue instances so restarts never
# overwrite an earlier job's log (r5: a restarted queue clobbered a log)
n=$(ls runs 2>/dev/null | sed -n 's/^\([0-9]\{1,\}\)_.*/\1/p' | sort -n | tail -1)
n=${n:-0}
while true; do
  line=$(head -n 1 tools/queue.txt 2>/dev/null)
  if [ -z "$line" ]; then
    echo "[runqueue] queue empty, exiting"
    break
  fi
  tail -n +2 tools/queue.txt > tools/queue.tmp && mv tools/queue.tmp tools/queue.txt
  n=$((n+1))
  to=$(echo "$line" | cut -d' ' -f1)
  cmd=$(echo "$line" | cut -d' ' -f2-)
  tag=$(echo "$cmd" | tr -c 'a-zA-Z0-9_-' '_' | cut -c1-80)
  echo "[runqueue] job $n (timeout ${to}s): $cmd"
  timeout "$to" bash -c "$cmd" > "runs/${n}_${tag}.log" 2>&1 &
  jpid=$!
  # Record the job pid + log path + timeout + command so the watchdog never
  # guesses via pgrep/newest-log heuristics (advisor r4 finding) and can
  # auto-requeue a killed job from its last saved train state (r5 forensics).
  echo "$jpid runs/${n}_${tag}.log $to $cmd" > runs/current_job
  wait "$jpid"
  rc=$?
  rm -f runs/current_job
  echo "[runqueue] job $n exited with $rc"
done
