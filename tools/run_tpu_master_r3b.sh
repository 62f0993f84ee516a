#!/bin/bash
# Re-prioritized round-3 TPU master (replaces run_tpu_master_r3.sh mid-run):
# the unpipelined engine rows were superseded by the pipelined serving loop,
# so the remaining chip time goes to: overhead probe -> pipelined engine
# suite -> training sweep -> codec act1d A/B -> train demo -> quant quality.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
bash tools/run_engine_pipelined.sh "$LOG"
# --- training: chunked CE + remat sweep (VERDICT item 2) --------------------
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat full --loss-chunk 0
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat full --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat dots --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 4 --seq 2048 --remat dots --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 4 --seq 2048 --remat full --loss-chunk 256
run 1800 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 --remat dots --loss-chunk 512
run 1800 python tools/bench_train.py --arch llama-1b --batch 8 --seq 2048 --remat dots --loss-chunk 256
# --- codec encode A/B: XLA conv vs fused Pallas act1d -----------------------
echo "=== $(date +%H:%M:%S) codec encode A/B: XLA conv vs Pallas act1d" | tee -a "$LOG"
run 1800 python tools/bench_codec.py encode --batch 8 --seconds 10
echo "=== act1d fused" | tee -a "$LOG"
TTS_MAX_PALLAS_ACT1D=1 timeout 1800 python tools/bench_codec.py encode --batch 8 --seconds 10 2>&1 | tail -3 | tee -a "$LOG"
# --- end-to-end train demo on the chip (VERDICT item 8) ---------------------
echo "=== $(date +%H:%M:%S) TPU train demo (300 steps + resume)" | tee -a "$LOG"
bash tools/run_tpu_train_demo.sh /tmp/train_demo 2>&1 | tail -25 | tee -a bench_logs/train_demo.log
# --- quant quality on the 1B (random init; trained anchor already in CI) ----
run 3600 python tools/quant_quality.py --arch llama-1b --modes int8,int4,int4-g128,int4-g64
echo "=== MASTER-B DONE $(date +%H:%M:%S)" | tee -a "$LOG"
