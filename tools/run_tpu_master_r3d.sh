#!/bin/bash
# Fourth revision: the manual-DMA kernel measured SLOWER (tiny per-head
# matmuls dominate, not grid overhead) — measure the XLA-gather paged path
# and contiguous KV instead, then codec A/B and the train demo. A v2
# kernel (dense block-diagonal matmuls over multi-page blocks) is being
# developed on the side and gets one slot at the end if ready.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
export TTS_MAX_PAGED_ATTN=xla
run 2400 python tools/probe_engine_overhead.py --k 16 --batch 64
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 --requests 256
unset TTS_MAX_PAGED_ATTN
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 --requests 256 --contiguous
# --- codec encode A/B: XLA conv vs fused Pallas act1d -----------------------
run 1800 python tools/bench_codec.py encode --batch 8 --seconds 10
echo "=== act1d fused" | tee -a "$LOG"
TTS_MAX_PALLAS_ACT1D=1 timeout 1800 python tools/bench_codec.py encode --batch 8 --seconds 10 2>&1 | tail -3 | tee -a "$LOG"
# --- end-to-end train demo on the chip (VERDICT item 8) ---------------------
echo "=== $(date +%H:%M:%S) TPU train demo (300 steps + resume)" | tee -a "$LOG"
bash tools/run_tpu_train_demo.sh /tmp/train_demo 2>&1 | tail -25 | tee -a bench_logs/train_demo.log
# --- 8B flagship engine row (whichever paged variant won above) -------------
run 3600 python tools/bench_engine.py --arch llama-8b --quantize int4 --max-batch 32 --steps-per-dispatch 32 --kv int8 --requests 128
echo "=== MASTER-D DONE $(date +%H:%M:%S)" | tee -a "$LOG"
