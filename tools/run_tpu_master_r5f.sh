#!/bin/bash
# Round-5 segment F: re-measure after fetch batching + paged pool-write
# skip + flash revert; park throttle sweep; then segment E (codec + TTFA).
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

# paged: accounting-only pool (no prefix cache) + persistent mirror
run 2400 $B --max-batch 64 --requests 256
# parked after fetch batching: whole-queue vs throttled
run 3000 $B --contiguous --max-batch 96 --requests 384 --prefill-ahead \
    --park-rows 288 --park-len 256
run 3000 $B --contiguous --max-batch 96 --requests 384 --prefill-ahead \
    --park-rows 288 --park-len 256 --park-groups-per-poll 3
run 2400 $B --contiguous --max-batch 64 --requests 256 --prefill-ahead \
    --park-rows 192 --park-len 256
# training after flash revert (+ health-stat removal retained)
run 3000 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 \
    --remat dots --loss-chunk 256 --steps 6
run 2400 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 \
    --remat dots --loss-chunk 256 --steps 4 --trace bench_logs/xprof_train_r5b
run 600 python tools/xplane_summary.py bench_logs/xprof_train_r5b --top 12
bash tools/run_tpu_master_r5e.sh
echo "=== MASTER-R5F DONE $(date +%H:%M:%S)" | tee -a "$LOG"
