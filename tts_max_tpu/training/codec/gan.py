"""Codec GAN training: generator + MPD/MSD discriminators in one jitted step.

Reference parity (/root/reference/tts/core/codec/decoder.py:122-399,
gan_training_loop.py:25-106): discriminator LSGAN update on (real, detached
fake), generator update on λ_mel·mel + λ_rms·rms + λ_adv·adv + λ_fm·fm,
FSQ quantizer frozen, both optimizers clipped at 1.0 and stepped per macro
step. The torch version runs two manual backwards through Fabric; here the
whole alternation is ONE jitted function — XLA shares the generator forward
between the discriminator's detached pass and the generator's grad pass.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tts_max_tpu.core.config import CodecTrainingConfig
from tts_max_tpu.models.codec import discriminator as disc
from tts_max_tpu.models.codec import losses, vocos


class GanMetrics(NamedTuple):
    disc_loss: jnp.ndarray
    gen_loss: jnp.ndarray
    adv_loss: jnp.ndarray
    fm_loss: jnp.ndarray
    mel_loss: jnp.ndarray
    rms_loss: jnp.ndarray


def split_generator_params(gen_params: Any) -> tuple[Any, Any]:
    """(trainable, frozen): the FSQ quantizer stays frozen
    (reference decoder.py:375-399)."""
    trainable = {k: v for k, v in gen_params.items() if k != "quantizer"}
    frozen = {"quantizer": gen_params["quantizer"]}
    return trainable, frozen


def merge_generator_params(trainable: Any, frozen: Any) -> Any:
    return {**trainable, **frozen}


def generator_losses(y_true, y_gen, mpd_params, msd_params, mpd_cfg, msd_cfg,
                     cfg: CodecTrainingConfig):
    feats_gen_mpd = disc.mpd(y_gen, mpd_params, mpd_cfg)
    feats_gen_msd = disc.msd(y_gen, msd_params, msd_cfg)
    feats_true_mpd = jax.lax.stop_gradient(disc.mpd(y_true, mpd_params, mpd_cfg))
    feats_true_msd = jax.lax.stop_gradient(disc.msd(y_true, msd_params, msd_cfg))

    mel = losses.multi_resolution_mel_loss(y_gen, y_true, cfg.sample_rate)
    rms = losses.rms_loss(y_true, y_gen)
    adv = losses.adversarial_loss(feats_gen_mpd) + losses.adversarial_loss(
        feats_gen_msd
    )
    fm = losses.feature_matching_loss(
        feats_gen_mpd, feats_true_mpd
    ) + losses.feature_matching_loss(feats_gen_msd, feats_true_msd)
    total = (
        cfg.lambda_mel * mel + cfg.lambda_rms * rms + cfg.lambda_adv * adv
        + cfg.lambda_fm * fm
    )
    return total, (mel, rms, adv, fm)


def gan_train_step(
    gen_trainable: Any,
    disc_params: Any,
    gen_opt_state: Any,
    disc_opt_state: Any,
    batch: dict,
    *,
    gen_frozen: Any,
    vocos_cfg: vocos.VocosConfig,
    mpd_cfg: disc.MPDConfig,
    msd_cfg: disc.MSDConfig,
    cfg: CodecTrainingConfig,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    grad_clip: float = 1.0,
):
    """One GAN macro step. batch: {"audio_codes": [B, Tc], "wav": [B, Ts]}."""
    codes = batch["audio_codes"]
    y_true = batch["wav"]

    def gen_fwd(trainable):
        params = merge_generator_params(trainable, gen_frozen)
        return vocos.decode(params, codes, vocos_cfg)

    y_gen_detached = jax.lax.stop_gradient(gen_fwd(gen_trainable))

    # ---- discriminator update (reference decoder.py:170-207) ----
    def d_loss_fn(dp):
        feats_true = disc.mpd(y_true, dp["mpd"], mpd_cfg)
        feats_gen = disc.mpd(y_gen_detached, dp["mpd"], mpd_cfg)
        loss = losses.discriminator_loss(feats_true, feats_gen)
        feats_true = disc.msd(y_true, dp["msd"], msd_cfg)
        feats_gen = disc.msd(y_gen_detached, dp["msd"], msd_cfg)
        loss = loss + losses.discriminator_loss(feats_true, feats_gen)
        return cfg.lambda_disc * loss

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params)
    d_grads = _clip(d_grads, grad_clip)
    d_updates, disc_opt_state = disc_tx.update(d_grads, disc_opt_state, disc_params)
    disc_params = optax.apply_updates(disc_params, d_updates)

    # ---- generator update (vs the pre-update discriminator, matching the
    # reference which computes both losses from the same state) ----
    def g_loss_fn(trainable):
        y_gen = gen_fwd(trainable)
        total, aux = generator_losses(
            y_true, y_gen, disc_params["mpd"], disc_params["msd"], mpd_cfg,
            msd_cfg, cfg,
        )
        return total, aux

    (g_loss, (mel, rms, adv, fm)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True
    )(gen_trainable)
    g_grads = _clip(g_grads, grad_clip)
    g_updates, gen_opt_state = gen_tx.update(g_grads, gen_opt_state, gen_trainable)
    gen_trainable = optax.apply_updates(gen_trainable, g_updates)

    metrics = GanMetrics(
        disc_loss=d_loss, gen_loss=g_loss, adv_loss=adv, fm_loss=fm,
        mel_loss=mel, rms_loss=rms,
    )
    return gen_trainable, disc_params, gen_opt_state, disc_opt_state, metrics


def gan_eval_step(gen_trainable, disc_params, batch, *, gen_frozen, vocos_cfg,
                  mpd_cfg, msd_cfg, cfg):
    """Validation losses, no updates (reference decoder.py:304-325)."""
    params = merge_generator_params(gen_trainable, gen_frozen)
    y_gen = vocos.decode(params, batch["audio_codes"], vocos_cfg)
    y_true = batch["wav"]
    feats_true_mpd = disc.mpd(y_true, disc_params["mpd"], mpd_cfg)
    feats_gen_mpd = disc.mpd(y_gen, disc_params["mpd"], mpd_cfg)
    feats_true_msd = disc.msd(y_true, disc_params["msd"], msd_cfg)
    feats_gen_msd = disc.msd(y_gen, disc_params["msd"], msd_cfg)
    d_loss = losses.discriminator_loss(
        feats_true_mpd, feats_gen_mpd
    ) + losses.discriminator_loss(feats_true_msd, feats_gen_msd)
    g_loss, (mel, rms, adv, fm) = generator_losses(
        y_true, y_gen, disc_params["mpd"], disc_params["msd"], mpd_cfg, msd_cfg, cfg
    )
    return GanMetrics(d_loss, g_loss, adv, fm, mel, rms)


def _clip(grads, max_norm):
    norm = optax.global_norm(grads)
    scale = jnp.where(
        jnp.isfinite(norm) & (norm > max_norm), max_norm / norm, 1.0
    )
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def create_gan_optimizers(cfg: CodecTrainingConfig,
                          betas=(0.9, 0.95), weight_decay=0.1):
    """Separate gen/disc AdamW (reference decoder.py:375-399)."""
    gen_tx = optax.adamw(cfg.generator_lr, b1=betas[0], b2=betas[1],
                         weight_decay=weight_decay)
    disc_tx = optax.adamw(cfg.discriminator_lr, b1=betas[0], b2=betas[1],
                          weight_decay=weight_decay)
    return gen_tx, disc_tx


def make_gan_step(vocos_cfg, mpd_cfg, msd_cfg, cfg, gen_frozen, gen_tx, disc_tx,
                  mesh=None):
    """Jitted GAN step; with a mesh, the batch shards over (data, fsdp) and
    params/optimizer state replicate — data-parallel GAN training with the
    gradient psum inserted by XLA (the reference's DDP
    find_unused_parameters dance, train_codec.py:254, disappears)."""
    step = functools.partial(
        gan_train_step,
        gen_frozen=gen_frozen,
        vocos_cfg=vocos_cfg,
        mpd_cfg=mpd_cfg,
        msd_cfg=msd_cfg,
        cfg=cfg,
        gen_tx=gen_tx,
        disc_tx=disc_tx,
    )
    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tts_max_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS

    batch_sh = NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))
    jitted = jax.jit(step)

    def sharded(gen_trainable, disc_params, gen_opt, disc_opt, batch):
        batch = {k: jax.device_put(v, batch_sh) for k, v in batch.items()}
        with mesh:
            return jitted(gen_trainable, disc_params, gen_opt, disc_opt, batch)

    return sharded
