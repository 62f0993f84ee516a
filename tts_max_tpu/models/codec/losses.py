"""GAN training losses for the codec decoder.

Reference parity (/root/reference/tts/core/codec/criterion.py and
decoder.py:170-276): LSGAN adversarial losses, 7-resolution log-mel L1,
spectral-convergence + log-magnitude STFT loss, feature matching, RMS-dB
match. Loss weights default to λ_mel=15, λ_fm=λ_adv=λ_rms=λ_disc=1
(decoder.py:147-153).
"""

from __future__ import annotations

import jax.numpy as jnp

from tts_max_tpu.ops.stft import hann_window, mel_spectrogram, stft

MEL_N_MELS = (5, 10, 20, 40, 80, 160, 320)
MEL_WINDOWS = (32, 64, 128, 256, 512, 1024, 2048)


# --- LSGAN (criterion.py:7-20) ----------------------------------------------


def disc_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray):
    real = jnp.mean((real_logits - 1.0) ** 2)
    fake = jnp.mean(fake_logits**2)
    return real, fake


def gen_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((fake_logits - 1.0) ** 2)


# --- multi-resolution mel loss (criterion.py:23-75) -------------------------


def multi_resolution_mel_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    sample_rate: int = 16000,
    clamp_eps: float = 1e-5,
) -> jnp.ndarray:
    """L1 between log10 mel spectrograms at 7 resolutions; x, y: [B, T]."""
    loss = 0.0
    for n_mels, win in zip(MEL_N_MELS, MEL_WINDOWS):
        mx = mel_spectrogram(x, sample_rate, win, win // 4, n_mels)
        my = mel_spectrogram(y, sample_rate, win, win // 4, n_mels)
        lx = jnp.log10(jnp.maximum(mx, clamp_eps))
        ly = jnp.log10(jnp.maximum(my, clamp_eps))
        loss = loss + jnp.mean(jnp.abs(lx - ly))
    return loss


# --- STFT loss (criterion.py:78-117) ----------------------------------------


def stft_loss(
    x: jnp.ndarray, y: jnp.ndarray, fft_size: int, hop_size: int, win_size: int
) -> jnp.ndarray:
    w = hann_window(win_size)
    xm = jnp.abs(stft(x, fft_size, hop_size, win_size, w))
    ym = jnp.abs(stft(y, fft_size, hop_size, win_size, w))
    sc = jnp.linalg.norm(ym - xm) / jnp.maximum(jnp.linalg.norm(ym), 1e-9)
    mag = jnp.mean(jnp.abs(jnp.log(xm + 1e-7) - jnp.log(ym + 1e-7)))
    return sc + mag


def multi_resolution_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_sizes=(1024, 2048, 512),
    hop_sizes=(120, 240, 50),
    win_sizes=(600, 1200, 240),
) -> jnp.ndarray:
    losses = [
        stft_loss(x, y, f, h, w) for f, h, w in zip(fft_sizes, hop_sizes, win_sizes)
    ]
    return sum(losses) / len(losses)


# --- RMS loss (decoder.py:224-238) ------------------------------------------


def rms_loss(y_true: jnp.ndarray, y_gen: jnp.ndarray) -> jnp.ndarray:
    """Squared dB difference of per-track RMS."""
    rms_t = jnp.sqrt(jnp.mean(y_true**2, axis=-1))
    rms_g = jnp.sqrt(jnp.mean(y_gen**2, axis=-1))
    db_t = 20 * jnp.log10(rms_t + 1e-10)
    db_g = 20 * jnp.log10(rms_g + 1e-10)
    return jnp.mean((db_g - db_t) ** 2)


# --- feature matching (decoder.py:254-269) ----------------------------------


def feature_matching_loss(feats_gen, feats_true) -> jnp.ndarray:
    """Sum of L1 over all intermediate layers (final logits excluded) of all
    sub-discriminators."""
    loss = 0.0
    for dg, dt in zip(feats_gen, feats_true):
        for g, t in zip(dg[:-1], dt[:-1]):
            loss = loss + jnp.mean(jnp.abs(g - t))
    return loss


def adversarial_loss(feats_gen) -> jnp.ndarray:
    """Sum of LSGAN generator losses over the final logits of each
    sub-discriminator (decoder.py:240-252)."""
    loss = 0.0
    for d in feats_gen:
        loss = loss + gen_loss(d[-1])
    return loss


def discriminator_loss(feats_true, feats_gen) -> jnp.ndarray:
    """Sum of real+fake LSGAN losses over final logits (decoder.py:177-207)."""
    loss = 0.0
    for dt, dg in zip(feats_true, feats_gen):
        r, f = disc_loss(dt[-1], dg[-1])
        loss = loss + r + f
    return loss
