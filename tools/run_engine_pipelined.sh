#!/bin/bash
# Pipelined engine suite (follow-up to run_tpu_bench_queue.sh): same
# configs driven through engine.run_iter(), the production serving loop
# that overlaps dispatch N+1 with fetching N's blob. One sync row is kept
# for the pipelining A/B.
set -u
LOG=${1:-/root/repo/bench_logs/engine_pipelined.log}
cd /root/repo
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) bench_engine $*" | tee -a "$LOG"
  timeout "$t" python tools/bench_engine.py "$@" 2>&1 | tail -4 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
echo "=== $(date +%H:%M:%S) overhead probe" | tee -a "$LOG"
timeout 2400 python tools/probe_engine_overhead.py --k 16 --batch 64 2>&1 | tail -3 | tee -a "$LOG"
timeout 2400 python tools/probe_engine_overhead.py --k 64 --batch 64 2>&1 | tail -3 | tee -a "$LOG"
run 2400 --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 16 --requests 256
run 2400 --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 --requests 256
run 2400 --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 64 --requests 256
run 2400 --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 128 --requests 256 --budget 512 --max-len 1024
run 2400 --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 --requests 256 --no-pipeline
run 2400 --arch llama-1b --quantize int4 --max-batch 64 --steps-per-dispatch 32 --requests 256
run 2400 --arch llama-1b --quantize int8 --max-batch 128 --steps-per-dispatch 32 --requests 384
run 3000 --arch llama-8b --quantize int4 --max-batch 32 --steps-per-dispatch 32 --kv int8 --requests 128
run 3000 --arch llama-8b --quantize int4-g128 --max-batch 32 --steps-per-dispatch 32 --kv int8 --requests 128
echo "=== PIPELINED SUITE DONE $(date +%H:%M:%S)" | tee -a "$LOG"
