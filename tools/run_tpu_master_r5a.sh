#!/bin/bash
# Round-5 segment A: paged persistent read cache + prefill-ahead TTFT.
# Controls first (reproduce r4 rows on today's relay), then the new modes.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -6 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
B="python tools/bench_engine.py --arch llama-1b --quantize int8 --steps-per-dispatch 32 --policy shortest"

# 1. contiguous r3-load control (r4: 8047)
run 2400 $B --contiguous --max-batch 64 --requests 256
# 2. paged r3-load, persistent read cache (NEW default; r4 gather mode: 5798)
run 2400 $B --max-batch 64 --requests 256
# 3. paged r3-load, gather mode control (--no-persistent-read-cache)
run 2400 $B --max-batch 64 --requests 256 --no-persistent-read-cache
# 4. contiguous r3-load + prefill-ahead (TTFT target p50<=1.5s)
run 2400 $B --contiguous --max-batch 64 --requests 256 --prefill-ahead
# 5. pool-96 headline control (r4: 8652, TTFT 2.5/6.2)
run 3000 $B --contiguous --max-batch 96 --requests 384
# 6. pool-96 headline + prefill-ahead (the TTFT headline attempt)
run 3000 $B --contiguous --max-batch 96 --requests 384 --prefill-ahead
# 7. paged persistent + prefill-ahead combined
run 2400 $B --max-batch 64 --requests 256 --prefill-ahead
echo "=== MASTER-R5A DONE $(date +%H:%M:%S)" | tee -a "$LOG"
