#!/bin/bash
# On-chip RLHF smoke run (VERDICT r3 item 5): synthetic data -> vectorize
# (CPU) -> GRPO on the real chip via the full training/rlhf/main.py CLI —
# rollout (AR sampling) -> dependency-free rewards (similarity via the
# spectral-embedding fallback + WER via token-level fallback) -> GRPO
# updates. Reward/loss curve lands in bench_logs/rlhf_demo_rewards.json.
#
# Usage: bash tools/run_tpu_rlhf_demo.sh [/tmp/rlhf_demo]
#   ARCH=llama-tiny STEPS=3 for a CPU smoke (JAX_PLATFORMS=cpu).
set -eu
DEMO=${1:-/tmp/rlhf_demo}
ARCH=${ARCH:-llama-1b}
STEPS=${STEPS:-40}
GENS=${GENS:-4}
BATCH=${BATCH:-2}
MAXCOMP=${MAXCOMP:-96}
cd /root/repo
mkdir -p bench_logs

if [ ! -f "$DEMO/ds/train_codes.npy" ]; then
  echo "=== $(date +%H:%M:%S) synthetic data + vectorize (CPU)"
  JAX_PLATFORMS=cpu python example/make_synthetic_samples.py \
      --output_dir "$DEMO" --n 32
  JAX_PLATFORMS=cpu python tools/data_vectorizer.py \
      --samples_path "$DEMO/samples.jsonl" --output_dir "$DEMO/ds" --tiny
  JAX_PLATFORMS=cpu python tools/data_merger.py --dataset_dir "$DEMO/ds"
fi

python - "$DEMO" <<PY
import json, sys
demo = sys.argv[1]
cfg = json.load(open("example/configs/rlhf.json"))
cfg["training"].update(batch_size=$BATCH, logging_steps=1,
                       learning_rate=1e-6)
cfg["checkpointing"].update(save_steps=20, keep_only_last_n_checkpoints=2)
cfg["rlhf"].update(num_generations=$GENS, max_prompt_length=512,
                   max_completion_length=$MAXCOMP,
                   reward_funcs=["wer", "similarity"],
                   reward_weights=[1.0, 0.5],
                   save_completions_every_n_steps=20)
cfg["output_dir"] = f"{demo}/run"
json.dump(cfg, open(f"{demo}/rlhf_demo.json", "w"), indent=1)
PY

echo "=== $(date +%H:%M:%S) GRPO $STEPS steps on $ARCH"
timeout 7000 python -m tts_max_tpu.training.rlhf.main \
    --config_path "$DEMO/rlhf_demo.json" --dataset_dir "$DEMO/ds" \
    --architecture "$ARCH" --total_steps "$STEPS"

echo "=== $(date +%H:%M:%S) collect reward curve"
python - "$DEMO" <<'PY'
import json, sys
demo = sys.argv[1]
rows = [json.loads(l) for l in open(f"{demo}/run/metrics.jsonl")]
keys = ("step", "loss", "reward_mean", "reward_std", "completion_len",
        "mean_logp", "grad_norm")
curve = [{k: r.get(k) for k in keys} for r in rows]
json.dump(curve, open("bench_logs/rlhf_demo_rewards.json", "w"), indent=1)
print(f"{len(curve)} points; first {curve[0] if curve else None}; "
      f"last {curve[-1] if curve else None}")
PY
echo "=== RLHF DEMO DONE $(date +%H:%M:%S)"
