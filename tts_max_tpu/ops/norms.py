"""Normalization ops. Computed in fp32, cast back to input dtype (XLA fuses)."""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm (used by both the SpeechLM and the Vocos backbone,
    reference decoder_modules.py:226-236)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y * scale.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over [B, T, C] (torch semantics: statistics are computed per
    (batch, group) over ALL spatial positions and the group's channels).
    Used by codec ResnetBlocks (reference decoder_modules.py:156-181)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    b, t, c = xf.shape
    g = xf.reshape(b, t, num_groups, c // num_groups)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    g = (g - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = g.reshape(b, t, c)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)
