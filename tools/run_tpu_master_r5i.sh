#!/bin/bash
# Round-5 segment I: re-run the trained-draft speculative chain after the
# safetensors-transpose export fix + on-manifold prompt construction;
# then the park throttle sweep (segment H).
set -u
cd /root/repo
LOG=bench_logs/tpu_queue_r5.log
run() {
  local t=$1; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "UserWarning|warnings.warn|donated|experimental" | tail -8 | tee -a "$LOG"
  echo "--- rc=$?" | tee -a "$LOG"
}
run 1800 python tools/convert_checkpoint.py \
    --checkpoint_dir /tmp/train_demo5/run/final_model \
    --output_dir /tmp/train_demo5/serving2 --architecture llama-1b
run 4800 python tools/distill_draft.py --dataset_dir /tmp/train_demo5/ds \
    --model_dir /tmp/train_demo5/serving2 --output_dir /tmp/train_demo5/draft2 \
    --draft_layers 4 --steps 600 --batch 4 --seq 512 --chunk 256
run 3600 python tools/bench_speculative.py --model_dir /tmp/train_demo5/serving2 \
    --draft_dir /tmp/train_demo5/draft2 --dataset_dir /tmp/train_demo5/ds \
    --batch 16 --steps 192 --prompt-len 256 --gammas 3,7 --greedy
run 3600 python tools/bench_speculative.py --model_dir /tmp/train_demo5/serving2 \
    --draft_dir /tmp/train_demo5/draft2 --dataset_dir /tmp/train_demo5/ds \
    --batch 16 --steps 192 --prompt-len 256 --gammas 3,7
bash tools/run_tpu_master_r5h.sh
echo "=== MASTER-R5I DONE $(date +%H:%M:%S)" | tee -a "$LOG"
