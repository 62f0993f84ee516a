#!/bin/bash
# Round-4 segment B: flash decode kernel + aliased dense2 on the chip.
# Chained after run_tpu_master_r4.sh (single chip — never run concurrently).
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r4.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -24 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
renv() {
  local t=$1 envs=$2; shift 2
  echo "=== $(date +%H:%M:%S) [$envs] $*" | tee -a "$LOG"
  timeout "$t" env $envs "$@" 2>&1 | tail -24 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}

# A. kernel-level: flash vs scan at three cache lengths; aliased dense2
run 4200 python tools/probe_decode_variants.py --batch 64 --k 32 \
    --lens 192,512,768 --widths 4,12 --variants dense2,dense --skip-unroll
# int8-KV variants (serving long-form config)
run 3600 python tools/probe_decode_variants.py --batch 64 --k 32 \
    --lens 512,1792 --widths "" --kv int8 --skip-unroll

# B. engine with flash decode
renv 2400 TTS_MAX_FLASH_DECODE=1 python tools/probe_engine_overhead.py \
    --k 32 --batch 64 --contiguous
renv 3600 TTS_MAX_FLASH_DECODE=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 \
    --requests 256 --contiguous
# flash reads only live chunks per row, so cache-slice staging may be pure
# copy overhead on top of it — measure the combination both ways
renv 3600 TTS_MAX_FLASH_DECODE=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 \
    --requests 256 --contiguous --no-staged
renv 3600 TTS_MAX_FLASH_DECODE=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 \
    --requests 256 --contiguous --no-staged --policy shortest
renv 3600 TTS_MAX_PAGED_ATTN=dense2 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 \
    --requests 256

# C. one-shot generate paths with flash (headline + long-form)
renv 2400 TTS_MAX_FLASH_DECODE=1 python bench.py
renv 4200 TTS_MAX_FLASH_DECODE=1 python tools/bench_longform.py --batch 64 \
    --steps 1760 --kv int8 --skip_full --window
renv 4200 TTS_MAX_FLASH_DECODE=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 32 --steps-per-dispatch 32 \
    --requests 64 --budget 1536 --max-len 1792 --kv int8 --contiguous

# D. 8B with flash
renv 4800 TTS_MAX_FLASH_DECODE=1 python tools/bench_engine.py \
    --arch llama-8b --quantize int4 --max-batch 64 --steps-per-dispatch 32 \
    --requests 128 --kv int8 --contiguous

echo "=== MASTER-R4B DONE $(date +%H:%M:%S)" | tee -a "$LOG"
