#!/bin/bash
# Round-5 segment E: acoustic encoder op-level attribution + streaming TTFA.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -30 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
# acoustic encoder attribution (VERDICT weak #5 / next #9)
run 2400 python tools/bench_codec.py encode --batch 8 --seconds 10 \
    --trace bench_logs/xprof_encode
run 600 python tools/xplane_summary.py bench_logs/xprof_encode --top 20
# decoder as a reference point
run 2400 python tools/bench_codec.py decode --batch 16 --seconds 30

# streaming time-to-first-audio (VERDICT weak #8/next #7)
run 3600 python tools/bench_ttfa.py --arch llama-1b --quantize int8 \
    --max-batch 64 --max-len 768 --load 128 --reps 3
run 3600 python tools/bench_ttfa.py --arch llama-1b --quantize int8 \
    --max-batch 64 --max-len 768 --load 128 --reps 1 --prefill-ahead
echo "=== MASTER-R5E DONE $(date +%H:%M:%S)" | tee -a "$LOG"
