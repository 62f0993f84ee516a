#!/bin/bash
# Round-5 segment D: aggressive parking TTFT rows, paged pool-commit skip,
# training MFU with the bundled TPU flash bwd + no per-step health stats,
# 8B long-budget retry.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -10 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
B="python tools/bench_engine.py --arch llama-1b --quantize int8 --steps-per-dispatch 32 --policy shortest"

# 1. aggressive parking: park the whole queue (rows = requests - pool)
run 2400 $B --contiguous --max-batch 64 --requests 256 --prefill-ahead \
    --park-rows 192 --park-len 256
run 3000 $B --contiguous --max-batch 96 --requests 384 --prefill-ahead \
    --park-rows 288 --park-len 256

# 2. paged persistent WITHOUT the pool commit (decode == contiguous now)
run 1800 python tools/probe_engine_overhead.py --k 32 --batch 64
run 2400 $B --max-batch 64 --requests 256

# 3. training MFU: bundled TPU flash bwd + health stats removed
run 3000 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 \
    --remat dots --loss-chunk 256 --steps 6
run 3000 python tools/bench_train.py --arch llama-1b --batch 4 --seq 2048 \
    --remat dots --loss-chunk 256 --steps 6
run 3000 python tools/bench_train.py --arch llama-1b --batch 4 --seq 2048 \
    --remat full --loss-chunk 256 --steps 6
run 2400 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 \
    --remat dots --loss-chunk 256 --steps 4 --trace bench_logs/xprof_train_r5
run 600 python tools/xplane_summary.py bench_logs/xprof_train_r5

# 4. 8B long-budget retry at pool 24
run 4800 python tools/bench_engine.py --arch llama-8b --quantize int4 \
    --max-batch 24 --steps-per-dispatch 16 --requests 48 --budget 1536 \
    --max-len 1792 --kv int8 --contiguous --policy shortest
echo "=== MASTER-R5D DONE $(date +%H:%M:%S)" | tee -a "$LOG"
