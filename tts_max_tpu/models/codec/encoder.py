"""Codec encoder: waveform (+ semantic features) → FSQ codes.

TPU-native re-design of the reference encoder
(/root/reference/tts/core/codec/encoder.py:17-128, encoder_modules.py):

- **AcousticEncoder**: initial k=7 conv (48 ch) → 5 EncoderBlocks with
  strides [2,2,4,4,5] (channel-doubling, SnakeBeta residual units with
  dilations 1/3/9) → SnakeBeta + final k=3 conv → 1024 ch at 50 Hz.
- **SemanticEncoder**: 3×(k=3 conv) residual stack over wav2vec-BERT-2.0
  layer-16 hidden states (1024 ch).
- fusion Linear 2048→2048 over [semantic ; acoustic], then FSQ → codes.

Everything is channel-last [B, T, C]. The wav2vec-BERT model itself lives in
models/codec/w2vbert.py (pluggable: precomputed features can be passed in,
matching the reference's two-stage forward, encoder.py:58-71).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core.constants import CODEC_HOP_LENGTH
from tts_max_tpu.models.codec import fsq
from tts_max_tpu.models.codec.filters import activation1d, init_snake_beta
from tts_max_tpu.models.codec.vocos import conv1d, init_conv, linear


@dataclass(frozen=True)
class EncoderConfig:
    num_generator_features: int = 48
    initial_conv_kernel_size: int = 7
    final_conv_kernel_size: int = 3
    up_ratios: tuple[int, ...] = (2, 2, 4, 4, 5)
    dilations: tuple[int, ...] = (1, 3, 9)
    acoustic_dim: int = 1024
    semantic_input_dim: int = 1024
    semantic_dim: int = 1024
    semantic_kernel_size: int = 3
    fsq: fsq.FSQConfig = field(default_factory=fsq.FSQConfig)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.up_ratios))

    @property
    def fused_dim(self) -> int:
        return self.semantic_dim + self.acoustic_dim


def tiny_encoder_config() -> EncoderConfig:
    return EncoderConfig(
        num_generator_features=4,
        up_ratios=(2, 2, 4, 4, 5),
        acoustic_dim=16,
        semantic_input_dim=8,
        semantic_dim=16,
        fsq=fsq.FSQConfig(dim=32),
    )


# --- residual unit / encoder block (reference encoder_modules.py:20-68) -----


def init_residual_unit(key, dim: int, kernel_size: int = 7, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "act1": init_snake_beta(dim, dtype),
        "conv1": init_conv(k1, kernel_size, dim, dim, dtype=dtype),
        "act2": init_snake_beta(dim, dtype),
        "conv2": init_conv(k2, 1, dim, dim, dtype=dtype),
    }


def residual_unit(x, p, kernel_size: int = 7, dilation: int = 1):
    pad = ((kernel_size - 1) * dilation) // 2
    h = activation1d(x, p["act1"])
    h = conv1d(h, p["conv1"], padding=pad, dilation=dilation)
    h = activation1d(h, p["act2"])
    h = conv1d(h, p["conv2"])
    return x + h


def init_encoder_block(key, dim: int, stride: int, dilations, dtype=jnp.float32):
    ks = jax.random.split(key, len(dilations) + 1)
    return {
        "units": [
            init_residual_unit(ks[i], dim // 2, dtype=dtype)
            for i in range(len(dilations))
        ],
        "act": init_snake_beta(dim // 2, dtype),
        "down": init_conv(ks[-1], 2 * stride, dim // 2, dim, dtype=dtype),
    }


def encoder_block(x, p, stride: int, dilations):
    for unit, d in zip(p["units"], dilations):
        x = residual_unit(x, unit, dilation=d)
    x = activation1d(x, p["act"])
    pad = stride // 2 + stride % 2
    return conv1d(x, p["down"], stride=stride, padding=pad)


# --- acoustic encoder (reference encoder_modules.py:130-189) ----------------


def init_acoustic_encoder(key, cfg: EncoderConfig, dtype=jnp.float32):
    d = cfg.num_generator_features
    ks = jax.random.split(key, len(cfg.up_ratios) + 3)
    p = {"initial": init_conv(ks[0], cfg.initial_conv_kernel_size, 1, d, dtype=dtype)}
    blocks = []
    for i, stride in enumerate(cfg.up_ratios):
        d *= 2
        blocks.append(init_encoder_block(ks[i + 1], d, stride, cfg.dilations, dtype))
    p["blocks"] = blocks
    p["final_act"] = init_snake_beta(d, dtype)
    p["final"] = init_conv(
        ks[-1], cfg.final_conv_kernel_size, d, cfg.acoustic_dim, dtype=dtype
    )
    return p


def acoustic_encoder(wav: jnp.ndarray, p, cfg: EncoderConfig) -> jnp.ndarray:
    """wav [B, L] (L a multiple of hop) -> [B, L/hop, acoustic_dim]."""
    x = wav[..., None]  # [B, L, 1]
    x = conv1d(x, p["initial"], padding=(cfg.initial_conv_kernel_size - 1) // 2)
    for block, stride in zip(p["blocks"], cfg.up_ratios):
        x = encoder_block(x, block, stride, cfg.dilations)
    x = activation1d(x, p["final_act"])
    return conv1d(x, p["final"], padding=(cfg.final_conv_kernel_size - 1) // 2)


# --- semantic encoder (reference encoder_modules.py:71-127) -----------------


def init_semantic_encoder(key, cfg: EncoderConfig, dtype=jnp.float32):
    k = cfg.semantic_kernel_size
    ks = jax.random.split(key, 4)
    return {
        "initial": init_conv(ks[0], k, cfg.semantic_input_dim, cfg.semantic_dim,
                             bias=False, dtype=dtype),
        "res1": init_conv(ks[1], k, cfg.semantic_dim, cfg.semantic_dim, dtype=dtype),
        "res2": init_conv(ks[2], k, cfg.semantic_dim, cfg.semantic_dim, dtype=dtype),
        "final": init_conv(ks[3], k, cfg.semantic_dim, cfg.semantic_dim,
                           bias=False, dtype=dtype),
    }


def semantic_encoder(feats: jnp.ndarray, p, cfg: EncoderConfig) -> jnp.ndarray:
    """feats [B, T, semantic_input_dim] -> [B, T, semantic_dim]."""
    pad = (cfg.semantic_kernel_size - 1) // 2
    x = conv1d(feats, p["initial"], padding=pad)
    h = jax.nn.relu(x)
    h = conv1d(h, p["res1"], padding=pad)
    h = jax.nn.relu(h)
    h = conv1d(h, p["res2"], padding=pad)
    x = x + h
    return conv1d(x, p["final"], padding=pad)


# --- full encoder -----------------------------------------------------------


def init_encoder(key, cfg: EncoderConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "acoustic": init_acoustic_encoder(ks[0], cfg, dtype),
        "semantic": init_semantic_encoder(ks[1], cfg, dtype),
        "fusion": {
            "kernel": (
                jax.random.normal(ks[2], (cfg.fused_dim, cfg.fused_dim))
                * cfg.fused_dim**-0.5
            ).astype(dtype),
            "bias": jnp.zeros((cfg.fused_dim,), dtype),
        },
        "quantizer": fsq.init_params(ks[3], cfg.fsq, dtype),
    }


def encode_features(
    params, wav: jnp.ndarray, semantic_feats: jnp.ndarray, cfg: EncoderConfig
) -> jnp.ndarray:
    """(wav [B, L], w2v features [B, T, Cs]) -> FSQ codes [B, T].

    Semantic and acoustic streams are length-aligned by truncation to the
    shorter (the reference relies on exact alignment; w2v-bert at 50 Hz).
    """
    ac = acoustic_encoder(wav, params["acoustic"], cfg)  # [B, Ta, Ca]
    se = semantic_encoder(semantic_feats, params["semantic"], cfg)  # [B, Ts, Cs]
    t = min(ac.shape[1], se.shape[1])
    fused = jnp.concatenate([se[:, :t], ac[:, :t]], axis=-1)
    fused = linear(fused, params["fusion"])
    _, codes = fsq.encode(params["quantizer"], fused, cfg.fsq)
    return codes


def pad_wav_for_encode(wav: np.ndarray, hop: int = CODEC_HOP_LENGTH) -> np.ndarray:
    """Host-side padding dance (reference encoder.py:115-120): pad up to a hop
    multiple; the extra half-hop reflect pad is applied to the *feature*
    input only. Stays on host (numpy) — no device sync in the hot path
    (the reference's wav.cpu() roundtrip is deliberately not replicated)."""
    L = wav.shape[-1]
    pad = hop - (L % hop) if L % hop else hop
    return np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])
