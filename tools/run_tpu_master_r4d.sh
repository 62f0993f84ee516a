#!/bin/bash
# Round-4 segment D: XLA dense decode attention (the MXU-shape fix) on chip.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r4.log
renv() {
  local t=$1 envs=$2; shift 2
  echo "=== $(date +%H:%M:%S) [$envs] $*" | tee -a "$LOG"
  timeout "$t" env $envs "$@" 2>&1 | tail -18 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
renv 3600 TTS_MAX_DENSE_DECODE_ATTN=1 python tools/probe_decode_variants.py \
    --batch 64 --k 32 --lens 192,512,768 --widths "" --skip-unroll --skip-flash
renv 3600 TTS_MAX_DENSE_DECODE_ATTN=1 python tools/probe_decode_variants.py \
    --batch 64 --k 32 --lens 512,1792 --widths "" --kv int8 --skip-unroll --skip-flash
# paged via XLA gather + dense attention (no Pallas operand copies)
renv 3600 TTS_MAX_DENSE_DECODE_ATTN=1 python tools/probe_decode_variants.py \
    --batch 64 --k 32 --lens "" --widths 4,8,12 --variants xla \
    --skip-unroll --skip-flash
renv 3600 TTS_MAX_DENSE_DECODE_ATTN=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 \
    --requests 256 --contiguous
renv 3600 TTS_MAX_DENSE_DECODE_ATTN=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 \
    --requests 256 --contiguous --policy shortest
renv 2400 TTS_MAX_DENSE_DECODE_ATTN=1 python bench.py
renv 4200 TTS_MAX_DENSE_DECODE_ATTN=1 python tools/bench_longform.py \
    --batch 64 --steps 1760 --kv int8 --skip_full --window
renv 4800 TTS_MAX_DENSE_DECODE_ATTN=1 python tools/bench_engine.py \
    --arch llama-8b --quantize int4 --max-batch 64 --steps-per-dispatch 32 \
    --requests 128 --kv int8 --contiguous
renv 4800 TTS_MAX_DENSE_DECODE_ATTN=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 32 --steps-per-dispatch 32 \
    --requests 64 --budget 1536 --max-len 1792 --kv int8 --contiguous
echo "=== MASTER-R4D DONE $(date +%H:%M:%S)" | tee -a "$LOG"
