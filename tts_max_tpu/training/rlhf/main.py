"""GRPO RLHF entrypoint.

Reference parity (/root/reference/tts/training/rlhf/rlhf_main.py): builds the
RLHF dataset (audio prompt + next-sample transcript), reward functions, and
runs GRPO — but on ONE mesh with the native sampler instead of a two-node
accelerate + vLLM-server topology (run_rlhf_combine.sh:45-61).

Run: python -m tts_max_tpu.training.rlhf.main --config_path rlhf.json \
        --dataset_dir DS [--model_dir HF_DIR | --architecture llama-tiny]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from tts_max_tpu.core.config import ExperimentConfig
from tts_max_tpu.core.tokenization import (
    build_byte_tokenizer,
    build_tokenizer,
    speech_vocab,
)
from tts_max_tpu.data import codes_io
from tts_max_tpu.data.normalization import create as create_normalizer
from tts_max_tpu.models import hf_import, llama
from tts_max_tpu.models.codec import api, vocos
from tts_max_tpu.parallel import mesh as pmesh
from tts_max_tpu.training.checkpointing import CheckpointManager, save_config
from tts_max_tpu.training.rlhf.dataset import TtsRLHFDataset
from tts_max_tpu.training.rlhf.grpo import GRPOTrainer
from tts_max_tpu.training.rlhf.rewards import create_reward_funcs
from tts_max_tpu.utils.logging import get_logger, setup_logging

log = get_logger(__name__)


def run_training(config: ExperimentConfig, args) -> None:
    env = pmesh.initialize_distributed()
    setup_logging(env.global_rank)

    # policy model
    if args.model_dir and os.path.isdir(args.model_dir):
        tokenizer = build_tokenizer(args.model_dir, expected_vocab_size=None)
        params, model_cfg = hf_import.load_model_from_hf_dir(args.model_dir)
    else:
        tokenizer = build_byte_tokenizer()
        # bf16 params + remat: the single-chip 1B training recipe (the
        # GRPO update with fp32 params + fp32 Adam OOMs 16 GB)
        import dataclasses

        model_cfg = dataclasses.replace(
            llama.config_for_architecture(
                args.architecture, vocab_size=len(tokenizer)
            ),
            remat=True,
        )
        import jax.numpy as jnp

        params = llama.init_params(
            jax.random.PRNGKey(config.training.seed), model_cfg,
            dtype=jnp.bfloat16,
        )
    sv = speech_vocab(tokenizer)

    # codec decoder for rewards
    if args.codec_decoder:
        decoder = api.create_decoder(args.codec_decoder)
    else:
        vcfg = vocos.tiny_vocos_config()
        decoder = api.AudioDecoder(
            vocos.init_decoder(jax.random.PRNGKey(1), vcfg), vcfg,
            api.DecoderConfig(),
        )
        log.warning("No codec decoder checkpoint: random decoder (smoke mode).")

    # dataset (audio prompt + next transcript)
    codes, samples, spans, _ = codes_io.load_and_filter_audio_codes_and_samples(
        args.dataset_dir, "train", config.dataset
    )
    normalizer = create_normalizer(
        config.modeling.parameters.enable_text_normalization
    )
    dataset = TtsRLHFDataset(
        os.path.basename(args.dataset_dir), samples, codes, spans, tokenizer,
        normalizer,
    )
    log.info("RLHF dataset: %d prompts", len(dataset))

    backends = {}
    if getattr(args, "whisper_dir", "") and os.path.isdir(args.whisper_dir):
        from tts_max_tpu.training.rlhf.asr import load_transcriber

        backends["transcribe_fn"] = load_transcriber(args.whisper_dir)
        log.info("WER reward backed by native JAX Whisper: %s", args.whisper_dir)
    if getattr(args, "dnsmos_dir", "") and os.path.isdir(args.dnsmos_dir):
        from tts_max_tpu.training.rlhf.dnsmos import load_dnsmos

        primary = os.path.join(args.dnsmos_dir, "sig_bak_ovr.onnx")
        p808 = os.path.join(args.dnsmos_dir, "model_v8.onnx")
        backends["dnsmos_fn"] = load_dnsmos(
            primary if os.path.exists(primary) else None,
            p808 if os.path.exists(p808) else None,
        )
    if getattr(args, "wavlm_dir", "") and os.path.isdir(args.wavlm_dir):
        from tts_max_tpu.training.rlhf.ecapa import load_wavlm_similarity_embedder

        backends["embed_fn"] = load_wavlm_similarity_embedder(
            args.wavlm_dir, getattr(args, "ecapa_checkpoint", "") or None
        )
        log.info("Similarity reward backed by native JAX WavLM+ECAPA: %s",
                 args.wavlm_dir)
        log.info("DNSMOS reward backed by onnx_lite: %s", args.dnsmos_dir)

    reward_funcs = create_reward_funcs(
        config.rlhf.reward_funcs,
        decoder,
        speech_vocab=sv,
        save_completions_steps=config.rlhf.save_completions_every_n_steps,
        save_dir=os.path.join(config.output_dir, "completion_samples"),
        logging_steps=config.training.logging_steps,
        backends=backends,
    )

    topology = None
    if getattr(args, "sampler_devices", 0) > 0:
        from tts_max_tpu.training.rlhf.topology import TrainerSamplerTopology

        topology = TrainerSamplerTopology.create(
            n_sampler=args.sampler_devices
        )
        log.info(
            "Multi-mesh RLHF: trainer mesh %s, sampler mesh %s",
            dict(topology.trainer_mesh.shape),
            dict(topology.sampler_mesh.shape),
        )
    trainer = GRPOTrainer(
        params, model_cfg, tokenizer, sv, reward_funcs, config.rlhf,
        learning_rate=config.training.learning_rate,
        seed=config.training.seed,
        topology=topology,
        rollout_via_engine=getattr(args, "rollout_via_engine", False),
    )
    os.makedirs(config.output_dir, exist_ok=True)
    save_config(config.output_dir, config)
    mgr = CheckpointManager(
        os.path.join(config.output_dir, "checkpoints"),
        keep_last_n=config.checkpointing.keep_only_last_n_checkpoints,
    )

    prompts_per_step = max(1, config.training.batch_size)
    rng = np.random.default_rng(config.training.seed)
    from tts_max_tpu.utils.metrics_logging import MetricsLogger
    from tts_max_tpu.utils.statistics import Statistics

    stats_acc = Statistics()
    metrics = MetricsLogger(config.output_dir)
    for step in range(args.total_steps):
        idxs = rng.integers(0, len(dataset), prompts_per_step)
        prompts = [dataset[int(i)] for i in idxs]
        stats = trainer.train_step(prompts)
        stats_acc.step = trainer.step
        stats_acc.record_loss("grpo", stats["loss"])
        stats_acc.record_counter("reward_mean", stats["reward_mean"])
        metrics.log(trainer.step, {
            k: v for k, v in stats.items()
            if isinstance(v, (int, float))
        })
        if trainer.step % config.training.logging_steps == 0:
            log.info("GRPO step %d: %s", trainer.step, stats)
        if (
            config.checkpointing.save_steps > 0
            and trainer.step % config.checkpointing.save_steps == 0
        ):
            mgr.save(trainer.step, trainer.params, trainer.opt_state, stats_acc,
                     config)
    mgr.wait()
    mgr.close()
    metrics.close()
    log.info("RLHF done at step %d", trainer.step)


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="GRPO RLHF alignment")
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--model_dir", default="")
    parser.add_argument("--architecture", default="llama-tiny")
    parser.add_argument("--codec_decoder", default="")
    parser.add_argument(
        "--whisper_dir",
        default=os.environ.get("WHISPER_CHECKPOINT", ""),
        help="Local HF Whisper dir for the WER reward (native JAX ASR).",
    )
    parser.add_argument(
        "--dnsmos_dir",
        default=os.environ.get("DNSMOS_ONNX_DIR", ""),
        help="Dir with DNSMOS ONNX weights (sig_bak_ovr.onnx / model_v8.onnx).",
    )
    parser.add_argument(
        "--wavlm_dir",
        default=os.environ.get("WAVLM_CHECKPOINT", ""),
        help="Local HF WavLM dir for the similarity reward (native JAX).",
    )
    parser.add_argument(
        "--ecapa_checkpoint",
        default=os.environ.get("ECAPA_CHECKPOINT", ""),
        help="UniSpeech ECAPA_TDNN_SMALL torch checkpoint (with the trained "
        "WavLM layer weights) for the similarity reward.",
    )
    parser.add_argument(
        "--sampler_devices", type=int, default=0,
        help="Split the device set: the LAST N devices become a "
        "tensor-parallel sampler sub-mesh running the serving engine, the "
        "rest an FSDP trainer sub-mesh; updated weights are resharded "
        "(device-to-device over ICI) to the sampler between rollout rounds "
        "— the reference's 2-node accelerate + vLLM-server topology "
        "(run_rlhf_combine.sh). 0 (default) = single-mesh time-multiplexed.",
    )
    parser.add_argument(
        "--rollout_via_engine", action="store_true",
        help="Generate rollouts through the continuous-batching serving "
        "engine instead of the one-shot generate program (default with a "
        "single mesh: generate program).",
    )
    parser.add_argument("--total_steps", type=int, default=100)
    args = parser.parse_args(argv)
    config = ExperimentConfig.from_json(args.config_path, required=False)
    run_training(config, args)


if __name__ == "__main__":
    main()
