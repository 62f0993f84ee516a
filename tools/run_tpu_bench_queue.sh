#!/bin/bash
# Serialized TPU measurement queue (VERDICT r2 items 1-3): the chip runs one
# job at a time; each under `timeout` (never hand-kill an in-flight remote
# compile — it wedges the relay).
set -u
LOG=${1:-/root/repo/bench_logs/tpu_queue.log}
cd /root/repo
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
# --- engine suite (batched prefill + warmup) --------------------------------
run 2400 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 8
run 2400 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 16
run 2400 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32
run 2400 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 16 --contiguous
run 2400 python tools/bench_engine.py --arch llama-1b --quantize int4 --max-batch 64 --steps-per-dispatch 16
run 3000 python tools/bench_engine.py --arch llama-8b --quantize int4 --max-batch 32 --steps-per-dispatch 16 --kv int8
run 3000 python tools/bench_engine.py --arch llama-8b --quantize int4-g128 --max-batch 32 --steps-per-dispatch 16 --kv int8
# --- training: chunked CE + remat sweep (VERDICT item 2) --------------------
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat full --loss-chunk 0
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat full --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat dots --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 4 --seq 2048 --remat dots --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 4 --seq 2048 --remat full --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat dots --loss-chunk 512
run 1800 python tools/bench_train.py --arch llama-1b --batch 8 --seq 2048 --remat dots --loss-chunk 256
echo "=== QUEUE DONE $(date +%H:%M:%S)" | tee -a "$LOG"
