#!/bin/bash
# Third revision of the round-3 TPU schedule: finish the train sweep, then
# validate + measure the engine with the manual-DMA paged kernel (the fix
# for the ~20 ms/step paged decode), then codec A/B, train demo, and the
# 1B quant-quality table last (lowest value; trained-anchor table is in CI).
set -u
cd /root/repo
LOG=bench_logs/tpu_queue.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
# --- remaining train sweep (chunked CE + remat; VERDICT item 2) -------------
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat dots --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 4 --seq 2048 --remat dots --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 4 --seq 2048 --remat full --loss-chunk 256
# --- engine with the manual-DMA paged kernel --------------------------------
run 3600 python tools/probe_engine_overhead.py --k 16 --batch 64
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 16 --requests 128
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 --requests 256
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 64 --requests 256
run 3600 python tools/bench_engine.py --arch llama-8b --quantize int4 --max-batch 32 --steps-per-dispatch 32 --kv int8 --requests 128
# --- codec encode A/B: XLA conv vs fused Pallas act1d -----------------------
run 1800 python tools/bench_codec.py encode --batch 8 --seconds 10
echo "=== act1d fused" | tee -a "$LOG"
TTS_MAX_PALLAS_ACT1D=1 timeout 1800 python tools/bench_codec.py encode --batch 8 --seconds 10 2>&1 | tail -3 | tee -a "$LOG"
# --- end-to-end train demo on the chip (VERDICT item 8) ---------------------
echo "=== $(date +%H:%M:%S) TPU train demo (300 steps + resume)" | tee -a "$LOG"
bash tools/run_tpu_train_demo.sh /tmp/train_demo 2>&1 | tail -25 | tee -a bench_logs/train_demo.log
echo "=== MASTER-C DONE $(date +%H:%M:%S)" | tee -a "$LOG"
