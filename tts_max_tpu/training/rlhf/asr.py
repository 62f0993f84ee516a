"""Whisper-backed ASR transcription for the WER reward.

The reference's WER reward hardwires whisper large-v3 through the openai
package (/root/reference/tts/training/rlhf/rewards.py:101-127,
reward_utils.py:19-36). Here the ASR is the native JAX Whisper
(models/whisper.py): this module packages it as the ``transcribe_fn(audio,
language) -> str`` backend that ``reward_utils.eval_wer`` consumes, with the
encoder + greedy decode jitted once and reused across reward calls.

Zero-egress image: ``load_transcriber`` needs a local HF whisper directory
(weights + tokenizer files); tests exercise the factory with a tiny
random-init model and a stub detokenizer.
"""

from __future__ import annotations

import functools
from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.models import whisper


def make_transcribe_fn(
    params,
    cfg: whisper.WhisperConfig,
    detokenize_fn: Callable[[list[int]], str],
    *,
    language_token_ids: Mapping[str, int] | None = None,
    task_token_id: int | None = None,
    notimestamps_token_id: int | None = None,
    max_len: int = 224,
    default_language: str = "en",
) -> Callable[[np.ndarray, str], str]:
    """Build ``transcribe_fn(audio [n] @16 kHz, language) -> str``.

    The forced prompt is ``<|startoftranscript|>[<|lang|>][<|task|>]
    [<|notimestamps|>]`` — pieces present only when their ids are given, so
    the prompt length (and hence the compiled program) is fixed per factory.
    """
    language_token_ids = dict(language_token_ids or {})
    chunk_samples = cfg.max_source_positions * 2 * whisper.HOP_LENGTH

    @jax.jit
    def _encode(mel):
        return whisper.encode(params, cfg, mel)

    @functools.partial(jax.jit, static_argnums=(2,))
    def _decode(enc, prompt, max_len):
        return whisper.greedy_decode(params, cfg, enc, prompt, max_len)

    def transcribe(audio: np.ndarray, language: str) -> str:
        wav = whisper.pad_or_trim(audio, chunk_samples)
        mel = whisper.log_mel_spectrogram(jnp.asarray(wav)[None], cfg.n_mels)
        enc = _encode(mel)
        prompt_ids = [cfg.decoder_start_token_id]
        lang_id = language_token_ids.get(
            (language or default_language).lower(),
            language_token_ids.get(default_language),
        )
        if lang_id is not None:
            prompt_ids.append(lang_id)
        if task_token_id is not None:
            prompt_ids.append(task_token_id)
        if notimestamps_token_id is not None:
            prompt_ids.append(notimestamps_token_id)
        prompt = jnp.asarray([prompt_ids], dtype=jnp.int32)
        tokens, lengths = _decode(enc, prompt, max_len)
        n = int(lengths[0])
        ids = [int(t) for t in np.asarray(tokens)[0, len(prompt_ids) : n]]
        return detokenize_fn(ids)

    return transcribe


def load_transcriber(
    model_dir: str,
    *,
    max_len: int = 224,
    dtype=jnp.bfloat16,
) -> Callable[[np.ndarray, str], str]:
    """transcribe_fn from a local HF whisper dir (weights + tokenizer).

    Mirrors the reference's task setup: transcribe task, no timestamps,
    language forced per sample (reward_utils.py:19-36).
    """
    from transformers import WhisperTokenizer

    params, cfg = whisper.load_whisper(model_dir, dtype=dtype)
    tok = WhisperTokenizer.from_pretrained(model_dir)

    def tok_id(t: str) -> int | None:
        i = tok.convert_tokens_to_ids(t)
        return None if i is None or i == tok.unk_token_id else i

    lang_ids = {}
    for code in tok.additional_special_tokens:
        # language tokens look like "<|en|>"
        if code.startswith("<|") and code.endswith("|>") and len(code) <= 8:
            inner = code[2:-2]
            if inner.isalpha():
                lang_ids[inner] = tok.convert_tokens_to_ids(code)

    def detok(ids: list[int]) -> str:
        return tok.decode(ids, skip_special_tokens=True).strip()

    return make_transcribe_fn(
        params,
        cfg,
        detok,
        language_token_ids=lang_ids,
        task_token_id=tok_id("<|transcribe|>"),
        notimestamps_token_id=tok_id("<|notimestamps|>"),
        max_len=max_len,
    )
