"""Finite Scalar Quantization (FSQ) — the codec's 65536-entry codebook.

Numerically equivalent to the reference's ``vector_quantize_pytorch``
ResidualFSQ with ``num_quantizers=1, levels=[4]*8, dim=2048``
(/root/reference/tts/core/codec/encoder.py:45-47, decoder_modules.py:418-420):
a Linear 2048→8 projection, per-dim tanh bounding, straight-through rounding
to one of 4 levels per dim, and a Linear 8→2048 output projection. Indices
are mixed-radix over the 8 dims → codebook of 4^8 = 65536.

Params pytree:
    {"project_in": {"kernel": [dim, 8], "bias": [8]},
     "project_out": {"kernel": [8, dim], "bias": [dim]}}
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core.constants import FSQ_LEVELS


@dataclass(frozen=True)
class FSQConfig:
    levels: tuple[int, ...] = FSQ_LEVELS
    dim: int = 2048
    eps: float = 1e-3  # bound epsilon (matches vector_quantize_pytorch FSQ)

    @property
    def codebook_dim(self) -> int:
        return len(self.levels)

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))


def _levels_arr(cfg: FSQConfig) -> np.ndarray:
    return np.asarray(cfg.levels, dtype=np.float32)


def _basis(cfg: FSQConfig) -> np.ndarray:
    return np.concatenate(
        [[1], np.cumprod(cfg.levels[:-1])]
    ).astype(np.int64)


def init_params(rng: jax.Array, cfg: FSQConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(rng)
    d, cd = cfg.dim, cfg.codebook_dim
    return {
        "project_in": {
            "kernel": (jax.random.normal(k1, (d, cd)) * d**-0.5).astype(dtype),
            "bias": jnp.zeros((cd,), dtype),
        },
        "project_out": {
            "kernel": (jax.random.normal(k2, (cd, d)) * cd**-0.5).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
    }


def bound(z: jnp.ndarray, cfg: FSQConfig) -> jnp.ndarray:
    """tanh-bound each dim into its level range (FSQ paper eq. 4)."""
    levels = jnp.asarray(_levels_arr(cfg))
    half_l = (levels - 1) * (1 + cfg.eps) / 2
    offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def quantize_codes(z: jnp.ndarray, cfg: FSQConfig) -> jnp.ndarray:
    """Bounded z [..., codebook_dim] -> normalized quantized codes in [-1, 1],
    with straight-through gradients."""
    bounded = bound(z, cfg)
    rounded = jnp.round(bounded)
    quantized = bounded + jax.lax.stop_gradient(rounded - bounded)  # round_ste
    half_width = jnp.asarray(_levels_arr(cfg)) // 2
    return quantized / half_width


def codes_to_indices(codes: jnp.ndarray, cfg: FSQConfig) -> jnp.ndarray:
    """Normalized codes [..., cd] -> integer indices [...]."""
    half_width = jnp.asarray(_levels_arr(cfg)) // 2
    digits = codes * half_width + half_width  # in [0, level-1]
    basis = jnp.asarray(_basis(cfg), dtype=jnp.float32)
    return jnp.round(jnp.sum(digits * basis, axis=-1)).astype(jnp.int32)


def indices_to_codes(indices: jnp.ndarray, cfg: FSQConfig) -> jnp.ndarray:
    """Integer indices [...] -> normalized codes [..., cd]."""
    basis = jnp.asarray(_basis(cfg), dtype=jnp.int32)
    levels = jnp.asarray(cfg.levels, dtype=jnp.int32)
    digits = (indices[..., None] // basis) % levels
    half_width = jnp.asarray(_levels_arr(cfg)) // 2
    return (digits.astype(jnp.float32) - half_width) / half_width


def encode(params, x: jnp.ndarray, cfg: FSQConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x [..., dim] -> (quantized_out [..., dim], indices [...]).

    Equivalent to ResidualFSQ.forward with one quantizer (scale == 1).
    """
    pin = params["project_in"]
    z = x @ pin["kernel"].astype(x.dtype) + pin["bias"].astype(x.dtype)
    codes = quantize_codes(z.astype(jnp.float32), cfg)
    indices = codes_to_indices(jax.lax.stop_gradient(codes), cfg)
    pout = params["project_out"]
    out = codes.astype(x.dtype) @ pout["kernel"].astype(x.dtype) + pout["bias"].astype(
        x.dtype
    )
    return out, indices


def decode_indices(params, indices: jnp.ndarray, cfg: FSQConfig) -> jnp.ndarray:
    """indices [...] -> embeddings [..., dim] (ResidualFSQ.get_output_from_indices)."""
    codes = indices_to_codes(indices, cfg)
    pout = params["project_out"]
    return codes @ pout["kernel"] + pout["bias"]
