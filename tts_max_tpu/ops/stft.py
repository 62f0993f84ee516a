"""STFT / ISTFT / mel-spectrogram ops — XLA-native (cuFFT/torch.stft replacement).

The ISTFT here reproduces the reference codec's custom "same-padding"
inverse STFT (irfft → windowed overlap-add → window-envelope normalization,
/root/reference/tts/core/codec/decoder_modules.py:19-93) but maps the
overlap-add fold onto ``lax.conv_transpose`` with an identity kernel — a
single dense op that XLA schedules onto the MXU, instead of a scatter.

The forward STFT matches torch.stft(center=True, pad_mode='reflect') exactly
(needed for GAN mel/STFT loss parity, criterion.py:89-117); the mel filter
bank matches torchaudio MelSpectrogram(norm='slaney', mel_scale='slaney')
(criterion.py:47-56).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """torch.hann_window(periodic=True) equivalent."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(dtype)


# --- framing / forward STFT --------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[B, L] -> [B, n_frames, frame_length] via gather (no copy blowup under jit)."""
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[:, idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: np.ndarray | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """torch.stft-compatible complex STFT. x: [B, L] -> [B, n_fft//2+1, T]."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    window = jnp.asarray(window)
    if center:
        p = n_fft // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # [B, F, T]


# --- overlap-add via conv_transpose -----------------------------------------


@functools.lru_cache(maxsize=8)
def _identity_kernel(win_length: int) -> np.ndarray:
    """[win, win, 1] kernel mapping frame channel c to output offset c.

    ``lax.conv_transpose`` (transpose_kernel=False) mirrors the spatial axis,
    so the identity lives on the anti-diagonal.
    """
    k = np.zeros((win_length, win_length, 1), dtype=np.float32)
    k[np.arange(win_length), win_length - 1 - np.arange(win_length), 0] = 1.0
    return k


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Fold: [B, T, win] -> [B, (T-1)*hop + win].

    Implemented as a stride-``hop`` transposed convolution with an identity
    kernel — one fused XLA op instead of T scatter-adds.
    """
    win = frames.shape[-1]
    kernel = jnp.asarray(_identity_kernel(win))
    y = jax.lax.conv_transpose(
        frames.astype(jnp.float32),
        kernel,
        strides=(hop,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y[..., 0]


def istft_same(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    window: np.ndarray | None = None,
) -> jnp.ndarray:
    """'Same-padding' ISTFT (reference decoder_modules.py:59-93).

    spec: complex [B, n_fft//2+1, T] -> wav [B, T * hop_length].
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    window = jnp.asarray(window)
    pad = (win_length - hop_length) // 2
    T = spec.shape[-1]

    ifft = jnp.fft.irfft(spec, n=n_fft, axis=1)  # [B, n_fft, T]
    frames = jnp.swapaxes(ifft, 1, 2) * window  # [B, T, win]
    y = overlap_add(frames, hop_length)
    y = y[:, pad:-pad] if pad else y

    # window envelope (constant per T — computed with the same fold)
    env_frames = jnp.broadcast_to(window**2, (1, T, win_length))
    env = overlap_add(env_frames, hop_length)
    env = env[:, pad:-pad] if pad else env
    # reference asserts (env > 1e-11).all(); clamp instead of assert under jit
    env = jnp.maximum(env, 1e-11)
    return y / env


# --- mel filter bank (slaney/slaney == torchaudio norm='slaney') -------------


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    lin = f / (200.0 / 3)
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_part = 15.0 + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_part, lin)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    lin = m * (200.0 / 3)
    return np.where(m >= min_log_mel, 1000.0 * np.exp(logstep * (m - min_log_mel)), lin)


@functools.lru_cache(maxsize=32)
def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """[n_fft//2+1, n_mels] triangular filters, slaney scale + slaney norm."""
    fmax = fmax if fmax is not None else sample_rate / 2
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    m_pts = np.linspace(
        _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2
    )
    f_pts = _mel_to_hz_slaney(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    # slaney norm: area normalization
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    power: float = 1.0,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jnp.ndarray:
    """torchaudio.transforms.MelSpectrogram(power=1, center=True,
    norm='slaney', mel_scale='slaney') equivalent. x: [B, L] -> [B, n_mels, T]."""
    spec = stft(x, n_fft, hop_length)  # [B, F, T]
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag**power
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    return jnp.einsum("bft,fm->bmt", mag, fb)
