#!/bin/bash
# Engine benchmark suite (VERDICT r2 item 1): priority rows of the
# {arch} x {quant} x {K} x {paged/contig} matrix, run sequentially on the
# one real chip. Each config is its own process (own compile cache warmup);
# `timeout` guards the relay (never kill an in-flight compile by hand).
set -u
LOG=${1:-/root/repo/bench_logs/engine_suite.log}
cd /root/repo
run() {
  echo "=== $(date +%H:%M:%S) bench_engine $*" | tee -a "$LOG"
  timeout 2400 python tools/bench_engine.py "$@" 2>&1 | tail -4 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
# 1B: K sweep at int8 (dispatch amortization), plus contiguous comparison
run --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 8
run --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32
run --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 64
run --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 --contiguous
# 1B int4 (needs K>1 by design)
run --arch llama-1b --quantize int4 --max-batch 64 --steps-per-dispatch 32
# 8B flagship serving: int4 + grouped int4
run --arch llama-8b --quantize int4 --max-batch 32 --steps-per-dispatch 32 --kv int8
run --arch llama-8b --quantize int4-g128 --max-batch 32 --steps-per-dispatch 32 --kv int8
echo "=== SUITE DONE $(date +%H:%M:%S)" | tee -a "$LOG"
