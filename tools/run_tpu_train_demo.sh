#!/bin/bash
# End-to-end TPU training demo (VERDICT r2 item 8): synthetic data ->
# vectorize (CPU) -> train llama-1b on the real chip via the full
# training/main.py CLI (300 steps, checkpoints) -> resume for +50 steps ->
# loss-curve artifact in bench_logs/train_demo_loss.json.
set -eu
DEMO=${1:-/tmp/train_demo}
ARCH=${ARCH:-llama-1b}         # override for CPU smoke: ARCH=llama-tiny
STEPS=${STEPS:-300}
RESUME_STEPS=${RESUME_STEPS:-350}
cd /root/repo
mkdir -p bench_logs

echo "=== $(date +%H:%M:%S) synthetic data + vectorize (CPU)"
JAX_PLATFORMS=cpu python example/make_synthetic_samples.py --output_dir "$DEMO" --n 48
JAX_PLATFORMS=cpu python tools/data_vectorizer.py --samples_path "$DEMO/samples.jsonl" \
    --output_dir "$DEMO/ds" --tiny --val_ratio 0.125
JAX_PLATFORMS=cpu python tools/data_merger.py --dataset_dir "$DEMO/ds"

ARCH=$ARCH python - "$DEMO" <<'PY'
import json, sys
demo = sys.argv[1]
cfg = json.load(open("example/configs/sft.json"))
t = cfg["training"]
t.update(batch_size=2, logging_steps=10, eval_steps=100, strategy="single")
cfg["checkpointing"].update(save_steps=100, keep_only_last_n_checkpoints=2)
cfg["modeling"]["parameters"]["model_name"] = ""
import os
cfg["modeling"]["parameters"]["architecture"] = os.environ.get("ARCH", "llama-1b")
if cfg["modeling"]["parameters"]["architecture"] != "llama-1b":
    cfg["modeling"]["parameters"]["vocab_size"] = 0
    cfg["training"]["gradient_checkpointing"] = False
cfg["train_weighted_datasets"] = {f"{demo}/ds": 1.0}
cfg["val_weighted_datasets"] = {f"{demo}/ds": 1.0}
cfg["output_dir"] = f"{demo}/run"
json.dump(cfg, open(f"{demo}/sft_demo.json", "w"), indent=1)
PY

echo "=== $(date +%H:%M:%S) train $STEPS steps"
ARCH=$ARCH timeout 5400 python -m tts_max_tpu.training.main \
    --config_path "$DEMO/sft_demo.json" --total_steps "$STEPS"

echo "=== $(date +%H:%M:%S) resume from last checkpoint, +50 steps"
LAST=$(ls -1 "$DEMO"/run/checkpoint_* -d | sort -t_ -k2 -n | tail -1)
python - "$DEMO" "$LAST" <<'PY'
import json, sys
demo, last = sys.argv[1], sys.argv[2]
cfg = json.load(open(f"{demo}/sft_demo.json"))
cfg["checkpointing"]["checkpoint_file_to_resume_from"] = last
cfg["checkpointing"]["only_load_model_weights"] = False
json.dump(cfg, open(f"{demo}/sft_demo_resume.json", "w"), indent=1)
PY
timeout 3600 python -m tts_max_tpu.training.main \
    --config_path "$DEMO/sft_demo_resume.json" --total_steps "$RESUME_STEPS"

echo "=== $(date +%H:%M:%S) collect loss curve"
python - "$DEMO" <<'PY'
import json, sys
demo = sys.argv[1]
rows = [json.loads(l) for l in open(f"{demo}/run/metrics.jsonl")]

curve = [
    {"step": r["step"],
     "loss": r.get("loss/total", r.get("val/loss/total")),
     "kind": "train" if "loss/total" in r else "val",
     "samples_per_sec": r.get("samples_per_sec"),
     "grad_norm": r.get("grad_norm")}
    for r in rows
    if r.get("loss/total", r.get("val/loss/total")) is not None
]
json.dump(curve, open("bench_logs/train_demo_loss.json", "w"), indent=1)
print(f"{len(curve)} loss points; first {curve[0] if curve else None}; "
      f"last {curve[-1] if curve else None}")
PY
echo "=== TRAIN DEMO DONE $(date +%H:%M:%S)"
