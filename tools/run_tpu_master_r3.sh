#!/bin/bash
# Round-3 serialized TPU measurement master: engine suite -> train sweep ->
# quant quality -> codec act1d kernel A/B -> full train demo.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue.log
bash tools/run_tpu_bench_queue.sh "$LOG"
echo "=== $(date +%H:%M:%S) codec encode A/B: XLA conv vs Pallas act1d" | tee -a "$LOG"
timeout 1800 python tools/bench_codec.py encode --batch 8 --seconds 10 2>&1 | tail -3 | tee -a "$LOG"
TTS_MAX_PALLAS_ACT1D=1 timeout 1800 python tools/bench_codec.py encode --batch 8 --seconds 10 2>&1 | tail -3 | tee -a "$LOG"
echo "=== $(date +%H:%M:%S) TPU train demo (300 steps + resume)" | tee -a "$LOG"
bash tools/run_tpu_train_demo.sh /tmp/train_demo 2>&1 | tail -25 | tee -a bench_logs/train_demo.log
echo "=== $(date +%H:%M:%S) quant quality on 1B (random init; anchor table already in CI)" | tee -a "$LOG"
timeout 3600 python tools/quant_quality.py --arch llama-1b --modes int8,int4,int4-g128,int4-g64 2>&1 | tail -8 | tee -a "$LOG"
echo "=== MASTER DONE $(date +%H:%M:%S)" | tee -a "$LOG"
