"""SFT / pretraining entrypoint.

Reference parity (/root/reference/tts/training/main.py:20-316): config_path +
dry_run + pretraining_mode flags, tokenizer → model (+optional vocab resize)
→ weighted datasets/loaders → steps math → cosine scheduler + AdamW → jitted
sharded train step → optional dry-run forward → loop → final model export.

Run: ``python -m tts_max_tpu.training.main --config_path cfg.json [--dry_run]``
— one process per host; devices on the host form the mesh (multi-host via
jax.distributed, parallel/mesh.py).
"""

from __future__ import annotations

import argparse
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core.config import ExperimentConfig
from tts_max_tpu.core.tokenization import build_byte_tokenizer, build_tokenizer
from tts_max_tpu.data import builder
from tts_max_tpu.data.collate import collate
from tts_max_tpu.data.loader import DataLoader
from tts_max_tpu.data.normalization import create as create_normalizer
from tts_max_tpu.models import hf_import, llama
from tts_max_tpu.parallel import mesh as pmesh
from tts_max_tpu.parallel.sharding import params_shardings
from tts_max_tpu.training import optim, train_step as ts
from tts_max_tpu.training.checkpointing import (
    CheckpointManager,
    save_config,
    save_final_model,
)
from tts_max_tpu.training.loop import run as run_loop
from tts_max_tpu.utils.logging import get_logger, setup_logging

log = get_logger(__name__)


def build_model_and_tokenizer(config: ExperimentConfig):
    """Tokenizer + params + model config (reference main.py:86-100).

    Order of preference: local HF dir (full parity path) → named architecture
    with the air-gapped byte tokenizer (from-scratch path).
    """
    mp = config.modeling.parameters
    vocab = mp.vocab_size
    if os.path.isdir(mp.model_name):
        tokenizer = build_tokenizer(
            mp.model_name, mp.max_seq_len, mp.codebook_size,
            expected_vocab_size=vocab,
        )
        params, cfg = hf_import.load_model_from_hf_dir(
            mp.model_name, vocab_size=len(tokenizer)
        )
    else:
        arch = mp.architecture or "llama-tiny"
        tokenizer = build_byte_tokenizer(mp.codebook_size)
        cfg = llama.config_for_architecture(
            arch, vocab_size=vocab or len(tokenizer), max_seq_len=mp.max_seq_len
        )
        params = llama.init_params(jax.random.PRNGKey(config.training.seed), cfg)
    return tokenizer, params, cfg


def run_training(config: ExperimentConfig, args) -> None:
    env = pmesh.initialize_distributed()
    setup_logging(env.global_rank)
    mesh = pmesh.mesh_for_strategy(config.training.strategy)
    log.info("Mesh: %s", dict(mesh.shape))

    dp_extent = mesh.shape["data"] * mesh.shape["fsdp"]
    if config.training.batch_size % dp_extent != 0:
        raise ValueError(
            f"batch_size {config.training.batch_size} must be divisible by "
            f"the data-parallel extent data*fsdp = {dp_extent} of the "
            f"{dict(mesh.shape)} mesh"
        )

    tokenizer, params, model_cfg = build_model_and_tokenizer(config)
    log.info(
        "Model: %s params, vocab %d", llama.param_count(params), model_cfg.vocab_size
    )

    # precision / remat knobs (reference precision sft.json:16, HF
    # gradient_checkpointing; here: param dtype cast + jax.checkpoint)
    import dataclasses as _dc

    if config.training.precision == "bf16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )
    if config.training.gradient_checkpointing:
        model_cfg = _dc.replace(
            model_cfg,
            remat=True,
            remat_policy=(
                "dots" if config.training.remat_policy == "dots" else None
            ),
        )

    normalizer = create_normalizer(
        config.modeling.parameters.enable_text_normalization
    )
    mp = config.modeling.parameters
    train_ds = builder.merge_datasets(
        tokenizer, config.train_weighted_datasets, mp.max_seq_len, "train",
        args.pretraining_mode, normalizer, config.dataset,
    )
    val_ds = (
        builder.merge_datasets(
            tokenizer, config.val_weighted_datasets, mp.max_seq_len, "val",
            args.pretraining_mode, normalizer, config.dataset,
        )
        if config.val_weighted_datasets
        else None
    )

    tcfg = config.training
    collate_fn = functools.partial(
        collate, pad_token_id=tokenizer.pad_token_id, max_seq_len=mp.max_seq_len
    )
    mk_loader = functools.partial(
        DataLoader,
        collate_fn=collate_fn,
        seed=tcfg.seed,
        process_index=env.global_rank,
        process_count=env.world_size,
    )
    train_loader = mk_loader(train_ds, tcfg.batch_size)
    val_loader = mk_loader(val_ds, tcfg.batch_size, shuffle=False) if val_ds else None

    # steps math (reference main.py:152-160)
    steps_per_epoch = max(
        1, len(train_ds) // (tcfg.batch_size * tcfg.gradient_accumulation_steps)
    )
    total_steps = args.total_steps or int(
        math.ceil(steps_per_epoch * tcfg.num_train_epochs)
    )
    warmup = max(1, int(total_steps * tcfg.warmup_ratio))
    log.info(
        "steps/epoch=%d total=%d warmup=%d", steps_per_epoch, total_steps, warmup
    )

    schedule = (
        optim.cosine_warmup_schedule(tcfg.learning_rate, warmup, total_steps)
        if tcfg.lr_scheduler == "cosine" and total_steps > warmup
        else optim.constant_schedule(tcfg.learning_rate)
    )
    tx = optim.create_optimizer(
        schedule, tcfg.betas, tcfg.weight_decay, mu_dtype=tcfg.adam_mu_dtype
    )
    opt_state = tx.init(params)

    step_fn = ts.make_train_step(
        mesh, model_cfg, tx, params, tcfg.gradient_clip_value,
        loss_chunk_size=tcfg.loss_chunk_size,
    )
    eval_fn = ts.make_eval_step(
        mesh, model_cfg, params, loss_chunk_size=tcfg.loss_chunk_size
    )
    p_sh = params_shardings(params, mesh)
    params = jax.device_put(params, p_sh)
    opt_state = jax.device_put(
        opt_state, ts._opt_state_shardings(tx, params, p_sh, mesh)
    )

    from tts_max_tpu.parallel.multihost import make_global_batch

    def shard_batch(b):
        sh = ts.data_sh_axis1(mesh)
        return make_global_batch(b, {k: sh for k in b})

    def wrapped_step(p, o, macro):
        return step_fn(p, o, shard_batch(macro))

    def wrapped_eval(p, b):
        return eval_fn(p, {k: np.asarray(v) for k, v in b.items()})

    if args.dry_run:
        # one forward + loss print (reference main.py:204-208)
        micro = next(iter(train_loader))
        macro = {
            "input_ids": micro["input_ids"][None],
            "labels": micro["labels"][None],
        }
        _, _, m = wrapped_step(params, opt_state, macro)
        log.info("Dry run loss: %.4f", float(m.loss))
        return

    os.makedirs(config.output_dir, exist_ok=True)
    save_config(config.output_dir, config)
    mgr = CheckpointManager(
        os.path.join(config.output_dir, "checkpoints"),
        keep_last_n=config.checkpointing.keep_only_last_n_checkpoints,
    )

    statistics = None
    resume = config.checkpointing.checkpoint_file_to_resume_from
    if resume or mgr.latest_step() is not None:
        try:
            params, opt_state, statistics = mgr.restore(
                None, params, opt_state,
                weights_only=config.checkpointing.only_load_model_weights,
            )
            log.info("Resumed from step %s", statistics.step if statistics else 0)
        except FileNotFoundError:
            pass

    # quality validator (reference main.py quality_validation wiring):
    # requires codec checkpoints; defaults to NoOp
    quality_validator = None
    vtype = config.checkpointing.validation_type
    if vtype and vtype != "none" and args.codec_decoder_checkpoint:
        from tts_max_tpu.core.tokenization import speech_vocab
        from tts_max_tpu.inference import quality
        from tts_max_tpu.inference.synthesize import LocalTtsModel
        from tts_max_tpu.models.codec import api

        decoder = api.create_decoder(args.codec_decoder_checkpoint)
        encoder = api.CachingAudioEncoder(
            api.create_encoder(args.codec_encoder_checkpoint)
        )
        tts_model = LocalTtsModel(
            params, model_cfg, tokenizer, speech_vocab(tokenizer), encoder,
            decoder,
        )
        prompt_wavs = dict(
            p.split(":", 1) for p in args.validation_prompt_wavs
        )
        quality_validator = quality.create(
            vtype, tts_model, config.output_dir, env.global_rank,
            env.world_size, prompt_wavs=prompt_wavs,
            prompt_wav_paths=list(prompt_wavs),
        )

    from tts_max_tpu.utils.metrics_logging import MetricsLogger

    metrics_logger = MetricsLogger(
        config.output_dir,
        experiment_name=config.experiment_name,
        use_wandb=args.use_wandb,
        is_main=env.is_main,
    )
    with mesh:
        params, opt_state, stats = run_loop(
            train_step=wrapped_step,
            eval_step=wrapped_eval,
            params=params,
            opt_state=opt_state,
            train_loader=train_loader,
            val_loader=val_loader,
            config=config,
            total_training_steps=total_steps,
            steps_per_epoch=steps_per_epoch,
            checkpoint_manager=mgr,
            quality_validator=quality_validator,
            lr_schedule=schedule,
            statistics=statistics,
            metrics_logger=metrics_logger,
        )
    metrics_logger.close()
    mgr.wait()
    if env.is_main:
        path = save_final_model(config.output_dir, params)
        log.info("Final model saved to %s", path)
    mgr.close()


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="SpeechLM SFT/pretraining")
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--pretraining_mode", action="store_true")
    parser.add_argument("--total_steps", type=int, default=0)
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--codec_encoder_checkpoint", default="",
                        help="xcodec2 .pt for quality validation")
    parser.add_argument("--codec_decoder_checkpoint", default="")
    parser.add_argument("--validation_prompt_wavs", nargs="*", default=[],
                        help="wav_path:transcript pairs for random-phrases "
                        "validation")
    args = parser.parse_args(argv)
    config = ExperimentConfig.from_json(args.config_path)
    run_training(config, args)


if __name__ == "__main__":
    main()
