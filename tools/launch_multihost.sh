#!/usr/bin/env bash
# Multi-host launcher — the TPU-native counterpart of the reference's
# two-node SLURM script (/root/reference/tts/training/rlhf/run_rlhf_combine.sh).
#
# On a TPU pod slice, run the SAME command on every host (e.g. with
# `gcloud compute tpus tpu-vm ssh --worker=all`); jax.distributed discovers
# peers from the TPU metadata. Under SLURM, srun one task per host:
#
#   srun --ntasks=$NUM_HOSTS --ntasks-per-node=1 tools/launch_multihost.sh \
#       train --config_path cfg.json
#
# Unlike the reference RLHF topology (node 0 = accelerate trainer, node 1 =
# vLLM server), every subcommand here runs on one mesh — the GRPO sampler is
# the jitted generator on the same chips, so there is no server to launch.
set -euo pipefail

SUBCOMMAND=${1:?usage: launch_multihost.sh {train|codec|rlhf|vectorize} args...}
shift

# SLURM rendezvous (reference environment.py:16-24): derive the coordinator
# from the first node in the job. NOTE: jax.distributed.initialize() does NOT
# read these env-var names itself — tts_max_tpu.parallel.mesh
# .initialize_distributed() reads them and passes them as ARGUMENTS
# (coordinator_address=, num_processes=, process_id=) before any backend use.
if [[ -n "${SLURM_JOB_ID:-}" ]]; then
  export JAX_COORDINATOR_ADDRESS="${JAX_COORDINATOR_ADDRESS:-$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1):8476}"
  export JAX_NUM_PROCESSES="${SLURM_NTASKS:-1}"
  export JAX_PROCESS_ID="${SLURM_PROCID:-0}"
fi

case "$SUBCOMMAND" in
  train)     exec python -m tts_max_tpu.training.main "$@" ;;
  codec)     exec python -m tts_max_tpu.training.codec.gan_loop "$@" ;;
  rlhf)      exec python -m tts_max_tpu.training.rlhf.main "$@" ;;
  vectorize) exec python tools/data_vectorizer.py "$@" ;;
  *) echo "unknown subcommand: $SUBCOMMAND" >&2; exit 2 ;;
esac
