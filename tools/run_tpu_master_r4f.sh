#!/bin/bash
# Round-4 segment F: delta-KV engine measurements + right-sized 8B rows.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r4.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -14 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
# delta engine step cost (engine probe uses the engine => delta by default)
run 2400 python tools/probe_engine_overhead.py --k 32 --batch 64 --contiguous
# headline serving rows with delta
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 64 --steps-per-dispatch 32 --requests 256 --contiguous
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 64 --steps-per-dispatch 32 --requests 256 --contiguous --policy shortest
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int4 \
    --max-batch 64 --steps-per-dispatch 32 --requests 256 --contiguous --policy shortest
# long-budget production case with delta
run 4800 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 32 --steps-per-dispatch 32 --requests 64 --budget 1536 \
    --max-len 1792 --kv int8 --contiguous --policy shortest
# 8B sized to fit: pool 48 x 640, K=16 (int4 weights + S4 copy + int8 pool)
run 4800 python tools/bench_engine.py --arch llama-8b --quantize int4 \
    --max-batch 48 --steps-per-dispatch 16 --requests 96 --max-len 640 \
    --kv int8 --contiguous
run 4800 python tools/bench_engine.py --arch llama-8b --quantize int4 \
    --max-batch 32 --steps-per-dispatch 16 --requests 96 --max-len 640 \
    --kv int8 --contiguous
# generate-path delta-KV: the long-form lever (cache copy was ~17 of 20.6
# ms/step at 1824 slots)
run 4200 python tools/bench_longform.py --batch 64 --steps 1760 --kv int8 \
    --skip_full --window --delta-k 64
run 4200 python tools/bench_longform.py --batch 64 --steps 1760 --kv int8 \
    --skip_full --window --delta-k 128
run 2400 python tools/bench_longform.py --batch 64 --steps 1760 --kv int8 \
    --skip_full --window
echo "=== $(date +%H:%M:%S) [TTS_MAX_DELTA_K=64] python bench.py" | tee -a "$LOG"
TTS_MAX_DELTA_K=64 timeout 2400 python bench.py 2>&1 | tail -8 | tee -a "$LOG"
# fixed-shape GRPO retry (one update compile instead of one per bucket)
echo "=== $(date +%H:%M:%S) RLHF fixed-shape smoke" | tee -a "$LOG"
STEPS=16 MAXCOMP=96 timeout 2700 bash tools/run_tpu_rlhf_demo.sh \
    /tmp/rlhf_demo_r4f 2>&1 | tail -8 | tee -a "$LOG"
echo "=== MASTER-R4F DONE $(date +%H:%M:%S)" | tee -a "$LOG"
