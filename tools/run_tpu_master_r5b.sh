#!/bin/bash
# Round-5 segment B: prefill-ahead rows (one-hot attach fix), paged
# attribution probes, 3072-context row, 8B long-budget engine row.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -8 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
B="python tools/bench_engine.py --arch llama-1b --quantize int8 --steps-per-dispatch 32 --policy shortest"

# prefill-ahead rows (re-run after the one-hot attach fix)
run 2400 $B --contiguous --max-batch 64 --requests 256 --prefill-ahead
run 3000 $B --contiguous --max-batch 96 --requests 384 --prefill-ahead
run 2400 $B --max-batch 64 --requests 256 --prefill-ahead

# paged attribution: decode-step probes (persistent vs gather vs contig)
run 1800 python tools/probe_engine_overhead.py --k 32 --batch 64
run 1800 python tools/probe_engine_overhead.py --k 32 --batch 64 --no-persistent-read-cache
run 1800 python tools/probe_engine_overhead.py --k 32 --batch 64 --contiguous
# paged attribution: prefill-group cost
run 1800 python tools/probe_prefill_cost.py --contiguous
run 1800 python tools/probe_prefill_cost.py
run 1800 python tools/probe_prefill_cost.py --no-persistent-read-cache

# 3072-context serving row (reference max_model_len; budgets ~1792)
run 4800 $B --contiguous --max-batch 24 --requests 48 --budget 1792 \
    --max-len 3072 --kv int8
# 8B long-budget engine row (VERDICT weak #6)
run 4800 python tools/bench_engine.py --arch llama-8b --quantize int4 \
    --max-batch 32 --steps-per-dispatch 16 --requests 64 --budget 1536 \
    --max-len 1792 --kv int8 --contiguous --policy shortest
echo "=== MASTER-R5B DONE $(date +%H:%M:%S)" | tee -a "$LOG"
