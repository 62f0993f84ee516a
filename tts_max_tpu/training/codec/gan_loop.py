"""Codec GAN training loop + entrypoint.

Reference parity (/root/reference/tts/training/codec/gan_training_loop.py,
train_codec.py): no eval loop by design (:168-169), fixed-batch quality
validation + checkpoint every save_steps, serving ``model_config.json``
written up-front with the computed token rate (train_codec.py:60-74).

Run: python -m tts_max_tpu.training.codec.gan_loop --config_path cfg.json
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from tts_max_tpu.core.config import ExperimentConfig
from tts_max_tpu.data.audio_io import save_wav
from tts_max_tpu.data.loader import DataLoader
from tts_max_tpu.models.codec import api, discriminator as disc, vocos
from tts_max_tpu.parallel import mesh as pmesh
from tts_max_tpu.training.checkpointing import CheckpointManager, save_config
from tts_max_tpu.training.codec import gan
from tts_max_tpu.training.codec.codec_data import CodecTrainingDataset, codec_collate
from tts_max_tpu.utils.logging import get_logger, setup_logging
from tts_max_tpu.utils.statistics import Statistics, Timer

log = get_logger(__name__)


class FixedBatchCodecValidator:
    """Decode the same fixed batch every save; write generated vs true wavs
    (reference codec_quality_validation.py:27-47)."""

    def __init__(self, batch: dict, vocos_cfg, gen_frozen, output_dir: str,
                 sample_rate: int):
        self._batch = batch
        self._cfg = vocos_cfg
        self._frozen = gen_frozen
        self._dir = output_dir
        self._sr = sample_rate
        self._decode = jax.jit(
            lambda p, c: vocos.decode(p, c, vocos_cfg)
        )

    def validate(self, gen_trainable, step: int) -> None:
        params = gan.merge_generator_params(gen_trainable, self._frozen)
        wavs = np.asarray(self._decode(params, self._batch["audio_codes"]))
        out = os.path.join(self._dir, f"step_{step}")
        os.makedirs(out, exist_ok=True)
        for i, w in enumerate(wavs):
            save_wav(os.path.join(out, f"generated_{i}.wav"), w, self._sr)
            save_wav(
                os.path.join(out, f"true_{i}.wav"), self._batch["wav"][i], self._sr
            )


def run_training(config: ExperimentConfig, args) -> None:
    env = pmesh.initialize_distributed()
    setup_logging(env.global_rank)
    ccfg = config.codec

    # build generator + discriminators (reference train_codec.py:85-93)
    vocos_cfg = (
        vocos.tiny_vocos_config() if args.tiny else vocos.VocosConfig(
            upsample_factors=ccfg.upsample_factors or (),
            upsample_kernel_sizes=ccfg.upsample_kernel_sizes or (),
        )
    )
    mpd_cfg = disc.tiny_mpd_config() if args.tiny else disc.MPDConfig()
    msd_cfg = disc.tiny_msd_config() if args.tiny else disc.MSDConfig()

    if args.decoder_checkpoint:
        decoder = api.create_decoder(args.decoder_checkpoint)
        gen_params = decoder._params
    else:
        gen_params = vocos.init_decoder(jax.random.PRNGKey(config.training.seed),
                                        vocos_cfg)
        log.warning("No decoder checkpoint: training from random init.")
    gen_trainable, gen_frozen = gan.split_generator_params(gen_params)
    disc_params = {
        "mpd": disc.init_mpd(jax.random.PRNGKey(1), mpd_cfg),
        "msd": disc.init_msd(jax.random.PRNGKey(2), msd_cfg),
    }

    gen_tx, disc_tx = gan.create_gan_optimizers(
        ccfg, config.training.betas, config.training.weight_decay
    )
    gen_opt = gen_tx.init(gen_trainable)
    disc_opt = disc_tx.init(disc_params)
    step_fn = gan.make_gan_step(
        vocos_cfg, mpd_cfg, msd_cfg, ccfg, gen_frozen, gen_tx, disc_tx
    )

    # datasets (reference codec_datasets; vectorized dirs carry wav paths)
    datasets = list(config.train_weighted_datasets) or [args.dataset_dir]
    ds = CodecTrainingDataset(
        datasets[0], "train", ccfg.code_window_size, vocos_cfg.hop_length,
        ccfg.sample_rate, config.dataset.min_sample_rate,
        seed=config.training.seed,
    )
    loader = DataLoader(
        ds, config.training.batch_size, codec_collate,
        seed=config.training.seed, process_index=env.global_rank,
        process_count=env.world_size,
    )

    os.makedirs(config.output_dir, exist_ok=True)
    save_config(config.output_dir, config)
    # serving model_config.json with computed token rate (train_codec.py:60-74)
    ups = int(np.prod(ccfg.upsample_factors)) if ccfg.upsample_factors else 1
    api.DecoderConfig(
        sample_rate=ccfg.sample_rate,
        token_rate=ccfg.sample_rate // (vocos_cfg.hop_length * ups),
        hop_length=vocos_cfg.hop_length,
        upsample_factors=ccfg.upsample_factors,
        kernel_sizes=ccfg.upsample_kernel_sizes,
    ).to_json(os.path.join(config.output_dir, "model_config.json"))

    # fixed 4-sample validation batch (reference train_codec.py:188-190)
    val_batch = codec_collate([ds[i] for i in range(min(4, len(ds)))])
    validator = FixedBatchCodecValidator(
        val_batch, vocos_cfg, gen_frozen,
        os.path.join(config.output_dir, "quality"), ccfg.sample_rate,
    )
    mgr = CheckpointManager(
        os.path.join(config.output_dir, "checkpoints"),
        keep_last_n=config.checkpointing.keep_only_last_n_checkpoints,
    )

    stats = Statistics()
    total_steps = args.total_steps
    save_steps = config.checkpointing.save_steps
    if args.dry_run:
        batch = next(iter(loader))
        _, _, _, _, m = step_fn(gen_trainable, disc_params, gen_opt, disc_opt,
                                {k: batch[k] for k in ("audio_codes", "wav")})
        log.info("Dry run: disc %.4f gen %.4f mel %.4f", float(m.disc_loss),
                 float(m.gen_loss), float(m.mel_loss))
        return

    epoch = 0
    iterator = iter(loader.batches(epoch))
    while stats.step < total_steps:
        t0 = time.perf_counter()
        try:
            batch = next(iterator)
        except StopIteration:
            epoch += 1
            iterator = iter(loader.batches(epoch))
            batch = next(iterator)
        gen_trainable, disc_params, gen_opt, disc_opt, m = step_fn(
            gen_trainable, disc_params, gen_opt, disc_opt,
            {k: batch[k] for k in ("audio_codes", "wav")},
        )
        stats.step += 1
        stats.record_loss("gen", float(m.gen_loss))
        stats.record_loss("disc", float(m.disc_loss))
        stats.record_loss("mel", float(m.mel_loss))
        stats.record_step_time(time.perf_counter() - t0)
        if stats.step % config.training.logging_steps == 0:
            log.info("GAN step %d: %s", stats.step, stats.logging_stats())
            stats.reset_window()
        if save_steps > 0 and stats.step % save_steps == 0:
            with Timer() as t:
                mgr.save(stats.step, {"gen": gen_trainable, "disc": disc_params},
                         {"gen": gen_opt, "disc": disc_opt}, stats, config)
                validator.validate(gen_trainable, stats.step)
            log.info("Step %d: checkpoint + validation %.2fs", stats.step, t.elapsed)
    mgr.wait()
    mgr.close()
    log.info("GAN training done at step %d", stats.step)


def main(argv=None):
    from tts_max_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Codec GAN training")
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--dataset_dir", default="")
    parser.add_argument("--decoder_checkpoint", default="")
    parser.add_argument("--total_steps", type=int, default=1000)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)
    config = ExperimentConfig.from_json(args.config_path, required=False)
    run_training(config, args)


if __name__ == "__main__":
    main()
