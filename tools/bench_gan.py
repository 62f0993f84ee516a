"""Codec GAN training-step throughput on the real chip.

Full-size Vocos generator + MPD/MSD discriminators, fixed 80-code windows
(reference codec_training_config code_window_size) — prints audio-seconds
trained per second per chip.

Usage: python tools/bench_gan.py [--batch 16] [--codes 80] [--steps 4]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from tts_max_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from tts_max_tpu.core.config import CodecTrainingConfig
from tts_max_tpu.core.constants import CODEC_HOP_LENGTH, CODEC_TOKEN_RATE
from tts_max_tpu.models.codec import discriminator as disc, vocos
from tts_max_tpu.training.codec import gan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--codes", type=int, default=80)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    vocos_cfg = vocos.VocosConfig()
    mpd_cfg, msd_cfg = disc.MPDConfig(), disc.MSDConfig()
    ccfg = CodecTrainingConfig()

    gen_params = jax.jit(
        lambda k: vocos.init_decoder(k, vocos_cfg)
    )(jax.random.PRNGKey(0))
    gen_trainable, gen_frozen = gan.split_generator_params(gen_params)
    disc_params = {
        "mpd": jax.jit(lambda k: disc.init_mpd(k, mpd_cfg))(jax.random.PRNGKey(1)),
        "msd": jax.jit(lambda k: disc.init_msd(k, msd_cfg))(jax.random.PRNGKey(2)),
    }
    gen_tx, disc_tx = gan.create_gan_optimizers(ccfg, (0.9, 0.95), 0.1)
    gen_opt = jax.jit(gen_tx.init)(gen_trainable)
    disc_opt = jax.jit(disc_tx.init)(disc_params)
    step_fn = gan.make_gan_step(
        vocos_cfg, mpd_cfg, msd_cfg, ccfg, gen_frozen, gen_tx, disc_tx
    )
    batch = {
        "audio_codes": jnp.zeros((args.batch, args.codes), jnp.int32),
        "wav": jnp.zeros((args.batch, args.codes * CODEC_HOP_LENGTH),
                         jnp.float32),
    }
    out = step_fn(gen_trainable, disc_params, gen_opt, disc_opt, batch)
    gen_trainable, disc_params, gen_opt, disc_opt, m = out
    _ = float(m.gen_loss)  # compile + warmup

    from tts_max_tpu.utils.profiling import fetch_rtt

    rtt = fetch_rtt()

    t0 = time.perf_counter()
    for _ in range(args.steps):
        (gen_trainable, disc_params, gen_opt, disc_opt, m) = step_fn(
            gen_trainable, disc_params, gen_opt, disc_opt, batch
        )
    _ = float(m.gen_loss)
    dt = time.perf_counter() - t0 - rtt
    audio_sec = args.batch * args.codes / CODEC_TOKEN_RATE * args.steps
    print(
        f"codec GAN batch {args.batch}x{args.codes} codes: "
        f"{audio_sec / dt:.1f} audio-sec trained/s/chip "
        f"({dt / args.steps * 1e3:.0f} ms/step, gen_loss "
        f"{float(m.gen_loss):.3f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
