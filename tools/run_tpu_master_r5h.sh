#!/bin/bash
# Round-5 segment H: park throttle sweep (prologue hypothesis) + final
# headline bench sanity.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -8 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
B="python tools/bench_engine.py --arch llama-1b --quantize int8 --steps-per-dispatch 32 --policy shortest"
for g in 2 4 8; do
  run 3000 $B --contiguous --max-batch 96 --requests 384 --prefill-ahead \
      --park-rows 288 --park-len 256 --park-groups-per-poll $g
done
# paged + parked + prefix-cache-off combined (the latency-optimized paged mode)
run 2400 $B --max-batch 64 --requests 256 --prefill-ahead \
    --park-rows 192 --park-len 256 --park-groups-per-poll 4
run 2400 python bench.py
echo "=== MASTER-R5H DONE $(date +%H:%M:%S)" | tee -a "$LOG"
