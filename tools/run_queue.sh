#!/bin/bash
# Round-2 TPU training queue: serial converged runs filling BASELINE.md gaps
# (VERDICT items 5/6). One job at a time — the TPU chip is exclusive.
cd /root/repo || exit 1
mkdir -p log/queue

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $(date '+%F %T') START $name ($*)" | tee -a log/queue/QUEUE.log
  timeout "$tmo" python -m sslrec_tpu.main "$@" > "log/queue/${name}.out" 2>&1
  local rc=$?
  echo "=== $(date '+%F %T') DONE  $name (exit $rc)" | tee -a log/queue/QUEUE.log
}

DD=/root/repo/datasets

run maerec_sports  10800 --model maerec   --dataset sports
run dcrec_sports   10800 --model dcrec_seq --dataset sports
run hmgcr_tmall     5400 --model hmgcr    --dataset tmall     --data_dir $DD
run smbrec_tmall    5400 --model smbrec   --dataset tmall     --data_dir $DD
run mbgmn_tmall     5400 --model mbgmn    --dataset tmall     --data_dir $DD
run kmclr_tmall     7200 --model kmclr    --dataset tmall     --data_dir $DD
run cml_tmall      10800 --model cml      --dataset tmall     --data_dir $DD
run hmgcr_ijcai     5400 --model hmgcr    --dataset ijcai_15  --data_dir $DD
run smbrec_ijcai    5400 --model smbrec   --dataset ijcai_15  --data_dir $DD
run mbgmn_ijcai     5400 --model mbgmn    --dataset ijcai_15  --data_dir $DD
run kmclr_ijcai     7200 --model kmclr    --dataset ijcai_15  --data_dir $DD
run cml_ijcai      10800 --model cml      --dataset ijcai_15  --data_dir $DD

echo "=== $(date '+%F %T') QUEUE COMPLETE" | tee -a log/queue/QUEUE.log
