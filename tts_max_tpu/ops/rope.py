"""Rotary position embeddings (Llama-style, with optional Llama-3 frequency
scaling). Precomputed cos/sin tables; applied in fp32.

The SpeechLM uses Llama-3 scaled RoPE; the Vocos backbone uses plain RoPE
(reference decoder_modules.py:254-290 via torchtune RotaryPositionalEmbeddings).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def llama3_scale_freqs(
    freqs: np.ndarray,
    factor: float = 32.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> np.ndarray:
    """Llama-3.x rope frequency rescaling (matches HF rope_scaling type 'llama3')."""
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    wavelen = 2 * math.pi / freqs
    # wavelen > low_freq_wavelen: scale down by factor
    scaled = np.where(wavelen > low_freq_wavelen, freqs / factor, freqs)
    # between: smooth interpolation
    smooth = (original_max_position / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    mid = (1 - smooth) * freqs / factor + smooth * freqs
    is_mid = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return np.where(is_mid, mid, scaled)


def rope_table(
    head_dim: int,
    max_len: int,
    theta: float = 10000.0,
    use_llama3_scaling: bool = False,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin) tables of shape [max_len, head_dim // 2]."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    if use_llama3_scaling:
        freqs = llama3_scale_freqs(freqs)
    t = np.arange(max_len, dtype=np.float64)
    ang = np.outer(t, freqs)
    return jnp.asarray(np.cos(ang), dtype=dtype), jnp.asarray(np.sin(ang), dtype=dtype)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, positions: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Apply rotary embedding to x: [..., seq, heads, head_dim].

    Uses the half-split convention (first half paired with second half), the
    same convention as HF Llama — required for checkpoint compatibility.
    ``positions``: optional [batch?, seq] int positions; default arange(seq).
    """
    seq = x.shape[-3]
    if positions is None:
        c = cos[:seq]
        s = sin[:seq]
        # [seq, 1, hd/2] to broadcast over heads
        c = c[:, None, :]
        s = s[:, None, :]
    else:
        c = jnp.take(cos, positions, axis=0)[..., None, :]
        s = jnp.take(sin, positions, axis=0)[..., None, :]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = xf.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(dtype)


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, positions: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Interleaved-pair RoPE convention (torchtune RotaryPositionalEmbeddings,
    used by the Vocos backbone attention, reference decoder_modules.py:268)."""
    seq = x.shape[-3]
    if positions is None:
        c = cos[:seq][:, None, :]
        s = sin[:seq][:, None, :]
    else:
        c = jnp.take(cos, positions, axis=0)[..., None, :]
        s = jnp.take(sin, positions, axis=0)[..., None, :]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    x1, x2 = x_pairs[..., 0], x_pairs[..., 1]
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
    return out.astype(dtype)
