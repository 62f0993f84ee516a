"""Public codec APIs: AudioEncoder / AudioDecoder.

Parity with the reference's encoding.py / decoding.py
(/root/reference/tts/core/codec/encoding.py:8-80, decoding.py:13-112):
interface objects with ``encode`` / ``decode``, a prompt-caching encoder,
``DecoderConfig`` read from ``model_config.json`` (defaulting the missing
``model_type`` key — known reference quirk), and factories that accept
either a torch xcodec2 checkpoint or a JAX params pytree.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core import constants
from tts_max_tpu.models.codec import encoder as enc
from tts_max_tpu.models.codec import torch_import, vocos


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Serving decoder config (reference decoding.py:13-35)."""

    sample_rate: int = 16000
    token_rate: int = 50
    hop_length: int = 320
    upsample_factors: tuple[int, ...] | None = None
    kernel_sizes: tuple[int, ...] | None = None
    model_type: str = "vocos"  # reference example config omits this key

    @classmethod
    def from_json(cls, path: str) -> "DecoderConfig":
        with open(path) as f:
            d = json.load(f)
        return cls(
            sample_rate=d.get("sample_rate", 16000),
            token_rate=d.get("token_rate", 50),
            hop_length=d.get("hop_length", 320),
            upsample_factors=tuple(d["upsample_factors"])
            if d.get("upsample_factors")
            else None,
            kernel_sizes=tuple(d["kernel_sizes"]) if d.get("kernel_sizes") else None,
            model_type=d.get("model_type", "vocos"),
        )

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "sample_rate": self.sample_rate,
                    "token_rate": self.token_rate,
                    "hop_length": self.hop_length,
                    "upsample_factors": list(self.upsample_factors)
                    if self.upsample_factors
                    else None,
                    "kernel_sizes": list(self.kernel_sizes)
                    if self.kernel_sizes
                    else None,
                    "model_type": self.model_type,
                },
                f,
                indent=2,
            )

    def vocos_config(self) -> vocos.VocosConfig:
        return vocos.VocosConfig(
            hop_length=self.hop_length,
            upsample_factors=self.upsample_factors or (),
            upsample_kernel_sizes=self.kernel_sizes or (),
        )


class AudioDecoder:
    """codes -> waveform (reference decoding.AudioDecoder:59-97)."""

    def __init__(self, params: Any, cfg: vocos.VocosConfig, config: DecoderConfig):
        self._params = params
        self._cfg = cfg
        self.config = config
        self._decode = jax.jit(lambda p, c: vocos.decode(p, c, cfg))

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def token_rate(self) -> int:
        return self.config.token_rate

    def decode(self, codes) -> np.ndarray:
        """codes: [T] or [B, T] int -> wav float32 [B, samples]."""
        codes = jnp.asarray(codes, dtype=jnp.int32)
        if codes.ndim == 1:
            codes = codes[None]
        return np.asarray(self._decode(self._params, codes))


class AudioEncoder:
    """waveform -> FSQ codes (reference encoding.AudioEncoder:29-53).

    ``semantic_fn(wav_padded [B, L]) -> feats [B, T, C]`` supplies the
    wav2vec-BERT layer-16 hidden states (models/codec/w2vbert.py), or any
    stand-in with the right shape.
    """

    def __init__(
        self,
        params: Any,
        cfg: enc.EncoderConfig,
        semantic_fn: Callable[[np.ndarray], jnp.ndarray],
        sample_rate: int = constants.CODEC_SAMPLE_RATE,
        token_rate: int = constants.CODEC_TOKEN_RATE,
    ):
        self._params = params
        self._cfg = cfg
        self._semantic_fn = semantic_fn
        self.sample_rate = sample_rate
        self.token_rate = token_rate
        self._encode = jax.jit(
            lambda p, w, f: enc.encode_features(p, w, f, cfg)
        )

    def encode(self, wav) -> np.ndarray:
        """wav: [L] or [B, L] float -> codes int32 [T] / [B, T].

        Pads to a hop multiple host-side (reference encoder.py:115-120)."""
        wav = np.asarray(wav, dtype=np.float32)
        squeeze = wav.ndim == 1
        if squeeze:
            wav = wav[None]
        wav = enc.pad_wav_for_encode(wav, self._cfg.hop_length)
        feats = self._semantic_fn(wav)
        codes = np.asarray(self._encode(self._params, jnp.asarray(wav), feats))
        return codes[0] if squeeze else codes


class CachingAudioEncoder:
    """Memoizes prompt encodings by id (reference encoding.py:56-72)."""

    def __init__(self, encoder: AudioEncoder):
        self._encoder = encoder
        self._cache: dict[str, np.ndarray] = {}

    @property
    def sample_rate(self) -> int:
        return self._encoder.sample_rate

    @property
    def token_rate(self) -> int:
        return self._encoder.token_rate

    def encode(self, prompt_id: str, wav) -> np.ndarray:
        if prompt_id not in self._cache:
            self._cache[prompt_id] = self._encoder.encode(wav)
        return self._cache[prompt_id]


def create_decoder(
    checkpoint_path: str | None = None,
    model_config_path: str | None = None,
    params: Any | None = None,
    config: DecoderConfig | None = None,
) -> AudioDecoder:
    """Factory (reference decoding.py:100-112): ``model_config.json`` lives
    next to the checkpoint unless given explicitly."""
    if config is None:
        if model_config_path is None and checkpoint_path is not None:
            model_config_path = os.path.join(
                os.path.dirname(checkpoint_path), "model_config.json"
            )
        config = (
            DecoderConfig.from_json(model_config_path)
            if model_config_path and os.path.exists(model_config_path)
            else DecoderConfig()
        )
    vcfg = config.vocos_config()
    if params is None:
        if checkpoint_path is None:
            raise ValueError("need checkpoint_path or params")
        sd = torch_import.load_torch_checkpoint(checkpoint_path)
        params = jax.tree_util.tree_map(
            jnp.asarray,
            torch_import.import_decoder(
                sd, depth=vcfg.depth, upsample_factors=vcfg.upsample_factors
            ),
        )
    return AudioDecoder(params, vcfg, config)


def create_encoder(
    checkpoint_path: str | None = None,
    params: Any | None = None,
    cfg: enc.EncoderConfig | None = None,
    semantic_fn: Callable | None = None,
) -> AudioEncoder:
    """Factory (reference encoding.py:75-80)."""
    cfg = cfg or enc.EncoderConfig()
    if params is None:
        if checkpoint_path is None:
            raise ValueError("need checkpoint_path or params")
        sd = torch_import.load_torch_checkpoint(checkpoint_path)
        params = jax.tree_util.tree_map(jnp.asarray, torch_import.import_encoder(sd))
    if semantic_fn is None:
        from tts_max_tpu.models.codec import w2vbert

        semantic_fn = w2vbert.default_semantic_fn(checkpoint_path)
    return AudioEncoder(params, cfg, semantic_fn)
