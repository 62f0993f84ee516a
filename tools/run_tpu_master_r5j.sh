#!/bin/bash
# Round-5 segment J: prefix-cache showcase load (shared voice prompt).
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -8 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
B="python tools/bench_engine.py --arch llama-1b --quantize int8 --steps-per-dispatch 32 --policy shortest --max-batch 64 --requests 256 --shared-prefix 256"
run 2400 $B --contiguous
run 2400 $B --prefix-cache
run 2400 $B
echo "=== MASTER-R5J DONE $(date +%H:%M:%S)" | tee -a "$LOG"
