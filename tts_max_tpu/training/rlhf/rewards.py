"""Reward functions for GRPO alignment.

Reference parity (/root/reference/tts/training/rlhf/rewards.py): each reward
function owns the audio decoder; a completion's speech tokens decode to a
waveform (prompt codes prepended for context, then the prompt region
trimmed); periodic wav dumping; WER / DNSMOS / speaker-similarity scoring;
a factory where only the first function saves wavs (:277-336).

Backends are pluggable (the image has no whisper/torchmetrics/WavLM
weights): ``transcribe_fn``, ``dnsmos_fn``, ``embed_fn``. Spectral fallback
embeddings keep the loop runnable air-gapped.
"""

from __future__ import annotations

import abc
import os
import uuid
from typing import Any, Callable, Sequence

import numpy as np

from tts_max_tpu.core import constants
from tts_max_tpu.core.tokenization import extract_speech_ids
from tts_max_tpu.data.audio_io import save_wav
from tts_max_tpu.ops.stft import mel_spectrogram
from tts_max_tpu.training.rlhf import reward_utils
from tts_max_tpu.utils.logging import get_logger

log = get_logger(__name__)


class RewardFunc(abc.ABC):
    """Owns the codec decoder; maps completions → waveforms → scores
    (reference rewards.py:24-98)."""

    def __init__(
        self,
        audio_decoder,
        speech_vocab=None,
        save_completions_steps: int = 0,
        save_dir: str = "",
        logging_steps: int = 10,
    ):
        self._audio_decoder = audio_decoder
        self._sv = speech_vocab
        self._save_completions_steps = save_completions_steps
        self._save_dir = save_dir
        self.steps = 0
        self.logging_steps = logging_steps
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)

    @property
    def __name__(self) -> str:
        return type(self).__name__

    def _save_completion(self, audio: np.ndarray) -> None:
        if (
            self._save_completions_steps > 0
            and self._save_dir
            and self.steps % self._save_completions_steps == 0
        ):
            path = os.path.join(
                self._save_dir, f"completion_{self.steps}_{uuid.uuid4()}.wav"
            )
            save_wav(path, audio, self._audio_decoder.sample_rate)

    def _completion_speech_ids(self, completion) -> np.ndarray:
        """completion: token-id array (dense map) or string ("<|s_N|>…")."""
        if isinstance(completion, str):
            return np.asarray(extract_speech_ids(completion), dtype=np.int64)
        if self._sv is None:
            raise ValueError("token-id completions need a speech_vocab")
        return self._sv.codes_from_tokens(np.asarray(completion, dtype=np.int64))

    def _decode_audio(self, prompt_speech_ids, completion) -> np.ndarray:
        """codes → wav with prompt prepended then trimmed
        (reference rewards.py:67-98). Returns [1, n] (possibly n=0)."""
        gen = self._completion_speech_ids(completion)
        if gen.size == 0:
            log.warning("empty generated speech ids; returning empty audio")
            return np.zeros((1, 0), dtype=np.float32)
        prompt = np.asarray(prompt_speech_ids, dtype=np.int64)
        try:
            wav = self._audio_decoder.decode(np.concatenate([prompt, gen]))
            prompt_samples = int(
                len(prompt)
                / self._audio_decoder.token_rate
                * self._audio_decoder.sample_rate
            )
            final = wav[:, prompt_samples:]
            self._save_completion(final)
            return final
        except Exception as e:
            log.error("Error decoding completion audio: %s", e)
            return np.zeros((1, 0), dtype=np.float32)

    @abc.abstractmethod
    def __call__(self, completions: Sequence[Any], **kwargs) -> list[float]:
        ...


class WERRewardFunc(RewardFunc):
    """reward = exp(-2.5·WER) via a pluggable ASR (reference :101-163)."""

    def __init__(self, *args, transcribe_fn: Callable | None = None, **kw):
        super().__init__(*args, **kw)
        self._transcribe = transcribe_fn

    def __call__(self, completions, **kwargs):
        rewards = []
        for prompt_ids, completion, truth, language in zip(
            kwargs["prompt_speech_ids"], completions,
            kwargs["completion_truth"], kwargs["language"],
        ):
            wav = self._decode_audio(prompt_ids, completion)
            if self._transcribe is None:
                rewards.append(reward_utils.normalize_wer(reward_utils.DEFAULT_WER))
                continue
            wer = reward_utils.eval_wer(
                self._transcribe, wav, self._audio_decoder.sample_rate, truth,
                language,
            )
            rewards.append(reward_utils.normalize_wer(wer))
        self.steps += 1
        if self.steps % self.logging_steps == 0:
            log.info("WERRewardFunc rewards: %s", rewards)
        return rewards


class DNSMOSRewardFunc(RewardFunc):
    """Speech-quality MOS reward via pluggable dnsmos_fn (reference :166-204)."""

    def __init__(self, *args, dnsmos_fn: Callable | None = None, **kw):
        super().__init__(*args, **kw)
        self._dnsmos = dnsmos_fn

    def __call__(self, completions, **kwargs):
        rewards = []
        for prompt_ids, completion in zip(kwargs["prompt_speech_ids"], completions):
            wav = self._decode_audio(prompt_ids, completion)
            if wav.shape[1] == 0 or self._dnsmos is None:
                rewards.append(reward_utils.normalize_dnsmos(1.0))
                continue
            try:
                mos = float(self._dnsmos(wav[0], self._audio_decoder.sample_rate))
            except Exception as e:
                log.error("dnsmos failed: %s", e)
                mos = 1.0
            rewards.append(reward_utils.normalize_dnsmos(mos))
        self.steps += 1
        return rewards


def spectral_embed_fn(audio: np.ndarray) -> np.ndarray:
    """Dependency-free speaker-embedding fallback: log-mel statistics
    (mean/std over time). A WavLM/ECAPA backend plugs in via ``embed_fn``."""
    import jax.numpy as jnp

    mel = mel_spectrogram(jnp.asarray(audio, dtype=jnp.float32)[None], 16000, 512,
                          160, 40)
    logm = np.asarray(jnp.log(jnp.maximum(mel, 1e-5)))[0]  # [40, T]
    return np.concatenate([logm.mean(axis=1), logm.std(axis=1)])


class SimilarityRewardFunc(RewardFunc):
    """Speaker-similarity reward (reference :207-274): cosine between
    embeddings of the prompt wav and the completion."""

    def __init__(self, *args, embed_fn: Callable | None = None, **kw):
        super().__init__(*args, **kw)
        self._embed = embed_fn or spectral_embed_fn

    def __call__(self, completions, **kwargs):
        from tts_max_tpu.data.audio_io import load_wav

        rewards = []
        for prompt_ids, completion, wav_path in zip(
            kwargs["prompt_speech_ids"], completions, kwargs["prompt_wav_path"]
        ):
            wav = self._decode_audio(prompt_ids, completion)
            try:
                prompt_wav, _ = load_wav(wav_path, reward_utils.EVAL_SAMPLE_RATE)
            except Exception:
                rewards.append(reward_utils.normalize_similarity(0.0))
                continue
            sim = reward_utils.eval_similarity(self._embed, prompt_wav[0], wav[0])
            rewards.append(reward_utils.normalize_similarity(sim))
        self.steps += 1
        return rewards


REWARD_CLASSES = {
    constants.WER_REWARD_FUNC: WERRewardFunc,
    constants.DNSMOS_REWARD_FUNC: DNSMOSRewardFunc,
    constants.SIMILARITY_REWARD_FUNC: SimilarityRewardFunc,
    "wer": WERRewardFunc,
    "dnsmos": DNSMOSRewardFunc,
    "similarity": SimilarityRewardFunc,
}


def create_reward_funcs(
    reward_func_names: Sequence[str],
    audio_decoder,
    speech_vocab=None,
    save_completions_steps: int = 0,
    save_dir: str = "",
    logging_steps: int = 10,
    backends: dict | None = None,
) -> list[RewardFunc]:
    """Factory (reference :277-336): only the FIRST function saves wavs."""
    backends = backends or {}
    funcs = []
    for i, name in enumerate(reward_func_names):
        cls = REWARD_CLASSES.get(name)
        if cls is None:
            raise ValueError(f"unknown reward func {name!r}")
        kw = dict(
            audio_decoder=audio_decoder,
            speech_vocab=speech_vocab,
            save_completions_steps=save_completions_steps if i == 0 else 0,
            save_dir=save_dir if i == 0 else "",
            logging_steps=logging_steps,
        )
        if cls is WERRewardFunc:
            kw["transcribe_fn"] = backends.get("transcribe_fn")
        elif cls is DNSMOSRewardFunc:
            kw["dnsmos_fn"] = backends.get("dnsmos_fn")
        elif cls is SimilarityRewardFunc:
            kw["embed_fn"] = backends.get("embed_fn")
        funcs.append(cls(**kw))
    return funcs
