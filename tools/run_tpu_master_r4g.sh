#!/bin/bash
# Round-4 segment G: nested-delta longform + delta headline.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r4.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated" | tail -8 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
run 4200 python tools/bench_longform.py --batch 64 --steps 1760 --kv int8 \
    --skip_full --window --delta-k 32
run 4200 python tools/bench_longform.py --batch 64 --steps 1760 --kv int8 \
    --skip_full --window --delta-k 64
echo "=== $(date +%H:%M:%S) [TTS_MAX_DELTA_K=32] python bench.py" | tee -a "$LOG"
TTS_MAX_DELTA_K=32 timeout 2400 python bench.py 2>&1 | tail -6 | tee -a "$LOG"
run 4200 python tools/bench_longform.py --arch llama-8b --batch 8 \
    --steps 1760 --kv int8 --skip_full --window --bits 4 --delta-k 64
echo "=== MASTER-R4G DONE $(date +%H:%M:%S)" | tee -a "$LOG"
