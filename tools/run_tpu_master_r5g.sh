#!/bin/bash
# Round-5 segment G: snake-impl experiments, parked re-run with the shared
# preview buffer, then the trained-draft speculative chain (segment C).
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -8 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
renv() {
  local t=$1 e=$2; shift 2
  echo "=== $(date +%H:%M:%S) [$e] $*" | tee -a "$LOG"
  timeout "$t" env $e "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -6 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
B="python tools/bench_engine.py --arch llama-1b --quantize int8 --steps-per-dispatch 32 --policy shortest"

# acoustic encoder snake experiments (round-5 attribution: 58% = snake)
renv 1800 TTS_MAX_SNAKE_IMPL=bf16 python tools/bench_codec.py encode --batch 8 --seconds 10
renv 1800 TTS_MAX_SNAKE_IMPL=transpose python tools/bench_codec.py encode --batch 8 --seconds 10
renv 1800 TTS_MAX_SNAKE_IMPL=bf16t python tools/bench_codec.py encode --batch 8 --seconds 10

# parked with the shared preview buffer (expect ~TTFT 0.75s at better tok/s)
run 3000 $B --contiguous --max-batch 96 --requests 384 --prefill-ahead \
    --park-rows 288 --park-len 256
run 2400 $B --contiguous --max-batch 64 --requests 256 --prefill-ahead \
    --park-rows 192 --park-len 256
bash tools/run_tpu_master_r5c.sh
echo "=== MASTER-R5G DONE $(date +%H:%M:%S)" | tee -a "$LOG"
