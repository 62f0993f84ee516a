#!/bin/bash
# Round-5 segment C: trained-draft speculative decoding (VERDICT r4 next #4).
# Train the memorized 1B demo -> export serving dir -> distill a 4-layer
# draft on-chip -> measure REALIZED acceptance + end-to-end tok/s on
# in-distribution prompts.
set -u
cd /root/repo
DEMO=${DEMO:-/tmp/train_demo5}
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -8 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}

# 1. memorization training (refreshes bench_logs/train_demo_loss.json too)
STEPS=${STEPS:-250} RESUME_STEPS=${RESUME_STEPS:-280} DEMO=$DEMO \
  bash tools/run_tpu_train_demo.sh "$DEMO" 2>&1 | tail -20 | tee -a "$LOG"

# 2. export the final model to a serving dir
run 1200 python tools/convert_checkpoint.py \
    --checkpoint_dir "$DEMO/run/final_model" \
    --output_dir "$DEMO/serving" --architecture llama-1b

# 3. distill the 4-layer draft from the trained target, on-chip
run 4800 python tools/distill_draft.py --dataset_dir "$DEMO/ds" \
    --model_dir "$DEMO/serving" --output_dir "$DEMO/draft" \
    --draft_layers 4 --steps 600 --batch 4 --seq 512 --chunk 256

# 4. realized acceptance + tok/s, in-distribution prompts
run 3600 python tools/bench_speculative.py --model_dir "$DEMO/serving" \
    --draft_dir "$DEMO/draft" --dataset_dir "$DEMO/ds" \
    --batch 16 --steps 192 --gammas 3,7 --greedy
run 3600 python tools/bench_speculative.py --model_dir "$DEMO/serving" \
    --draft_dir "$DEMO/draft" --dataset_dir "$DEMO/ds" \
    --batch 16 --steps 192 --gammas 3,7
echo "=== MASTER-R5C DONE $(date +%H:%M:%S)" | tee -a "$LOG"
