#!/bin/bash
# Fifth segment, priority order: dense-kernel decode probe -> dense engine
# row -> act1d fused retry -> contiguous probe -> K=64 row (if time).
set -u
cd /root/repo
LOG=bench_logs/tpu_queue.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -6 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
run 3600 python tools/probe_engine_overhead.py --k 32 --batch 64
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 32 --requests 256
echo "=== $(date +%H:%M:%S) act1d fused retry (dynamic_slice fix)" | tee -a "$LOG"
TTS_MAX_PALLAS_ACT1D=1 timeout 1800 python tools/bench_codec.py encode --batch 8 --seconds 10 2>&1 | tail -3 | tee -a "$LOG"
run 2400 python tools/probe_engine_overhead.py --k 32 --batch 64 --contiguous
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 --max-batch 64 --steps-per-dispatch 64 --requests 256
echo "=== MASTER-E DONE $(date +%H:%M:%S)" | tee -a "$LOG"
