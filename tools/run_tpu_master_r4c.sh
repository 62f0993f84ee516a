#!/bin/bash
# Round-4 segment C: re-run the rows killed by the kv-int8 donation bug.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r4.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -22 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
run 4800 python tools/bench_engine.py --arch llama-8b --quantize int4 \
    --max-batch 64 --steps-per-dispatch 32 --requests 128 --kv int8 --contiguous
run 4800 python tools/bench_engine.py --arch llama-8b --quantize int4 \
    --max-batch 64 --steps-per-dispatch 32 --requests 128 --kv int8
run 4800 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 32 --steps-per-dispatch 32 --requests 64 --budget 1536 \
    --max-len 1792 --kv int8 --contiguous
run 4800 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 32 --steps-per-dispatch 32 --requests 64 --budget 1536 \
    --max-len 1792 --kv int8 --contiguous --no-staged
echo "=== $(date +%H:%M:%S) act1d fused retry (HBM pin)" | tee -a "$LOG"
TTS_MAX_PALLAS_ACT1D=1 timeout 2400 python tools/bench_codec.py encode \
    --batch 8 --seconds 10 2>&1 | tail -4 | tee -a "$LOG"
run 7200 bash tools/run_tpu_rlhf_demo.sh /tmp/rlhf_demo_r4c
echo "=== MASTER-R4C DONE $(date +%H:%M:%S)" | tee -a "$LOG"
