#!/bin/bash
# Round-4 TPU measurement queue, priority order (VERDICT r3 items 1-9):
#   A. decode-variant ablation (scan vs unroll, paged widths) — attribution
#   B. engine probes: staged vs unstaged step cost, contiguous + paged
#   C. engine bench rows: 1B int8 staged/unstaged/policy, 1B int4, 8B int4
#   D. long-budget serving scenario (staging's production win)
#   E. act1d fused kernel retry + codec encode bench
#   F. speculative decoding numbers
#   G. train-step ablation (+ xprof attempt)
#   H. RLHF on-chip smoke (long)
# Each segment is independently timeout-bounded; the persistent XLA
# compilation cache makes re-runs cheap.
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r4.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | tail -20 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}

# A. attribution: is the per-layer cache slice materialized?
run 4200 python tools/probe_decode_variants.py --batch 64 --k 32 \
    --lens 192,512,768 --widths 4,8,12

# B. engine step probes (staged default vs unstaged)
run 2400 python tools/probe_engine_overhead.py --k 32 --batch 64 --contiguous
run 2400 python tools/probe_engine_overhead.py --k 32 --batch 64 --contiguous --no-staged
run 2400 python tools/probe_engine_overhead.py --k 32 --batch 64

# C. engine bench rows
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 64 --steps-per-dispatch 32 --requests 256 --contiguous
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 64 --steps-per-dispatch 32 --requests 256 --contiguous --no-staged
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 64 --steps-per-dispatch 32 --requests 256 --contiguous --policy shortest
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 64 --steps-per-dispatch 32 --requests 256
run 3600 python tools/bench_engine.py --arch llama-1b --quantize int4 \
    --max-batch 64 --steps-per-dispatch 32 --requests 256 --contiguous
run 4800 python tools/bench_engine.py --arch llama-8b --quantize int4 \
    --max-batch 64 --steps-per-dispatch 32 --requests 128 --kv int8 --contiguous
run 4800 python tools/bench_engine.py --arch llama-8b --quantize int4 \
    --max-batch 64 --steps-per-dispatch 32 --requests 128 --kv int8

# D. long-budget serving (staging's production case: budgets ~ 1536 of 1792)
run 4800 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 32 --steps-per-dispatch 32 --requests 64 --budget 1536 \
    --max-len 1792 --kv int8 --contiguous
run 4800 python tools/bench_engine.py --arch llama-1b --quantize int8 \
    --max-batch 32 --steps-per-dispatch 32 --requests 64 --budget 1536 \
    --max-len 1792 --kv int8 --contiguous --no-staged

# E. act1d fused kernel retry (two lowering fixes landed end of r3)
echo "=== $(date +%H:%M:%S) act1d fused kernel retry" | tee -a "$LOG"
TTS_MAX_PALLAS_ACT1D=1 timeout 2400 python tools/bench_codec.py encode \
    --batch 8 --seconds 10 2>&1 | tail -4 | tee -a "$LOG"
timeout 2400 python tools/bench_codec.py encode --batch 8 --seconds 10 \
    2>&1 | tail -4 | tee -a "$LOG"

# F. speculative decoding
run 3600 python tools/bench_speculative.py --arch llama-1b --quantize int8 \
    --batch 16 --steps 192 --gammas 3,7 --draft-layers 4
run 2400 python tools/bench_speculative.py --arch llama-1b --quantize int8 \
    --batch 16 --steps 192 --gammas 7 --draft-layers 4 --greedy

# G. train-step ablation (dots remat compiles ~1 min; full remat avoided)
run 3600 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 \
    --remat dots --loss-chunk 256 --steps 6 --ablate
run 3600 python tools/bench_train.py --arch llama-1b --batch 2 --seq 2048 \
    --remat dots --loss-chunk 256 --steps 4 --trace bench_logs/xprof_train

# H. RLHF on-chip smoke (longest; killable without losing earlier results)
run 7200 bash tools/run_tpu_rlhf_demo.sh /tmp/rlhf_demo_r4

echo "=== MASTER-R4 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
