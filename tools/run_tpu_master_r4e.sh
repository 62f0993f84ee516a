#!/bin/bash
# Round-4 segment E: scatter-copy ablation + attend-before-write fix.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r4.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -20 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
renv() {
  local t=$1 envs=$2; shift 2
  echo "=== $(date +%H:%M:%S) [$envs] $*" | tee -a "$LOG"
  timeout "$t" env $envs "$@" 2>&1 | tail -20 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
run 3600 python tools/probe_decode_variants.py --batch 64 --k 32 \
    --lens 192,512,768 --widths "" --skip-unroll --skip-flash --nowrite --prewrite
run 2400 python tools/probe_decode_variants.py --batch 64 --k 32 \
    --lens 512,1792 --widths "" --kv int8 --skip-unroll --skip-flash --nowrite --prewrite
renv 3600 TTS_MAX_PREWRITE_ATTN=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 \
    --requests 256 --contiguous
renv 3600 TTS_MAX_PREWRITE_ATTN=1 python tools/bench_engine.py \
    --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 \
    --requests 256 --contiguous --policy shortest
renv 2400 TTS_MAX_PREWRITE_ATTN=1 python bench.py
renv 4200 TTS_MAX_PREWRITE_ATTN=1 python tools/bench_longform.py \
    --batch 64 --steps 1760 --kv int8 --skip_full --window
echo "=== MASTER-R4E DONE $(date +%H:%M:%S)" | tee -a "$LOG"
