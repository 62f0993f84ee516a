"""End-user TTS inference: text (+ voice prompt) → waveform.

Parity with the reference inference stack
(/root/reference/tts/inference/inferencing.py:15-276): InferenceSettings
(same defaults), ``LocalTtsModel.synthesize_speech`` (prompt-audio encode →
prompt compile → AR generation → codec decode → prompt-region trim) and
``complete_prompt`` (pure speech continuation).

TPU-native differences: generation is the single jitted while_loop program
(inference/generate.py), and generated token ids convert to codec codes
through the dense SpeechVocab map — no string detokenize/re-parse round trip
(the reference's extract_speech_ids path, inferencing.py:53-63, exists as a
fallback in core/tokenization.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.core import prompting
from tts_max_tpu.core.tokenization import SpeechVocab
from tts_max_tpu.inference.generate import make_host_staged_generate_fn
from tts_max_tpu.models import llama
from tts_max_tpu.ops.sampling import SamplingParams
from tts_max_tpu.utils.statistics import Timer


@dataclasses.dataclass
class InferenceSettings:
    """Defaults mirror reference inferencing.py:15-40."""

    temperature: float = 0.8
    max_tokens: int = 1792
    min_tokens: int = 10
    top_p: float = 1.0
    top_k: int = 50
    repetition_penalty: float = 1.1
    frequency_penalty: float = 0.3
    seed: int = 42
    # Constrain sampling to the speech-token window (speech tokens +
    # structural markers, SpeechVocab.generation_window). Guarantees every
    # generated token is a legal speech-segment token (the reference instead
    # silently drops non-speech output, inferencing.py:53-63) and cuts the
    # per-step LM-head read ~3x on the bandwidth-bound decode.
    constrain_to_speech: bool = True

    def sampling_params(self) -> SamplingParams:
        return SamplingParams(
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            repetition_penalty=self.repetition_penalty,
            frequency_penalty=self.frequency_penalty,
            max_new_tokens=self.max_tokens,
        )


DEFAULT_INFERENCE_SETTINGS = InferenceSettings()


@dataclasses.dataclass(frozen=True)
class InferenceResult:
    wav: np.ndarray
    encoding_time: float
    decoding_time: float
    inference_time: float


def _bucket(n: int, step: int = 64) -> int:
    return ((n + step - 1) // step) * step


class LocalTtsModel:
    """Local TTS inference (reference LocalTtsModel, inferencing.py:162-228)."""

    def __init__(
        self,
        params: Any,
        cfg: llama.LlamaConfig,
        tokenizer,
        speech_vocab: SpeechVocab,
        audio_encoder,  # CachingAudioEncoder
        audio_decoder,  # AudioDecoder
        normalizer=None,  # TextNormalizer; None = normalization.create()
    ):
        from tts_max_tpu.data import normalization

        self._params = params
        self._cfg = cfg
        self._tokenizer = tokenizer
        self._sv = speech_vocab
        self._audio_encoder = audio_encoder
        self._audio_decoder = audio_decoder
        self._normalizer = normalizer or normalization.create()
        self._gen_cache: dict = {}

    def _vocab_window(self, settings: InferenceSettings):
        if not settings.constrain_to_speech:
            return None
        lo, size = self._sv.generation_window()
        if lo + size > self._cfg.vocab_size:  # tokenizer outgrew the model
            return None
        return (lo, size)

    def _generate(self, input_ids: np.ndarray, settings: InferenceSettings):
        """Run the jitted generator; prompt length bucketed to limit
        recompiles (one program per (bucket, max_tokens))."""
        n = len(input_ids)
        bucket = _bucket(n)
        key = (
            bucket,
            settings.max_tokens,
            dataclasses.astuple(settings)[:7],
            settings.constrain_to_speech,
        )
        if key not in self._gen_cache:
            # host-staged: the cache grows as generation fills it, and no
            # single XLA execution spans the whole (up to 1792-token) loop
            self._gen_cache[key] = make_host_staged_generate_fn(
                self._cfg,
                settings.sampling_params(),
                max_new_tokens=settings.max_tokens,
                eos_id=self._sv.speech_end_id,
                cache_len=bucket + settings.max_tokens,
                vocab_window=self._vocab_window(settings),
                min_new_tokens=settings.min_tokens,
                # delta-KV stages: commit the cache once per 32 steps
                # instead of per step (+14% short-form, 3.1x long-form —
                # BENCHMARKS.md round 4)
                delta_k=32,
            )
        fn = self._gen_cache[key]
        padded = np.zeros((1, bucket), dtype=np.int32)
        padded[0, :n] = input_ids
        res = fn(
            self._params,
            jnp.asarray(padded),
            jnp.asarray([n], dtype=jnp.int32),
            jax.random.PRNGKey(settings.seed),
        )
        toks = np.asarray(res.tokens[0][: int(res.num_generated[0])])
        return toks

    def synthesize_speech(
        self,
        inference_settings: InferenceSettings,
        text_to_synthesize: str,
        prompt_id: str,
        prompt_wav,
        audio_prompt_transcription: str,
        voice_description: str = "",
        enable_instruction: bool = True,
        language: str | None = None,
    ) -> InferenceResult:
        # normalize free text, routing by the caller's language tag or
        # detection (reference text_normalization.py:73-90)
        text_to_synthesize = self._normalizer.normalize(
            text_to_synthesize, language
        )
        speech_ids: list[int] = []
        encoding_time = 0.0
        if not voice_description or enable_instruction:
            with Timer() as t:
                # encode returns [T] for a 1-D wav and [1, T] for the [1, n]
                # wavs audio_io.load_wav produces — flatten either way
                speech_ids = np.asarray(
                    self._audio_encoder.encode(prompt_id, prompt_wav)
                ).ravel().tolist()
            encoding_time = t.elapsed

        prompt = prompting.compile_inference_prompt(
            audio_prompt_transcription,
            text_to_synthesize,
            speech_ids,
            voice_description,
            enable_instruction,
        )
        with Timer() as t:
            input_ids = np.asarray(
                self._tokenizer.encode(prompt, add_special_tokens=True),
                dtype=np.int32,
            )
            generated = self._generate(input_ids, inference_settings)
            # keep only speech tokens; prepend the prompt's speech ids so the
            # decoder sees contiguous context (reference inferencing.py:142-145)
            gen_speech = self._sv.codes_from_tokens(generated)
            all_codes = np.concatenate(
                [np.asarray(speech_ids, dtype=np.int64), gen_speech]
            )
            with Timer() as dt:
                wav = self._audio_decoder.decode(all_codes)
            decoding_time = dt.elapsed
        inference_time = t.elapsed

        # trim the prompt-audio region (reference inferencing.py:157-159)
        prompt_samples = int(
            len(speech_ids)
            / self._audio_decoder.token_rate
            * self._audio_decoder.sample_rate
        )
        return InferenceResult(
            wav=wav[:, prompt_samples:],
            encoding_time=encoding_time,
            decoding_time=decoding_time,
            inference_time=inference_time,
        )

    def complete_prompt(
        self, prompt_wav, inference_settings: InferenceSettings
    ) -> np.ndarray:
        """Pure speech continuation (reference inferencing.py:231-276)."""
        codes = np.asarray(
            self._audio_encoder.encode("__complete__", prompt_wav)
        ).ravel()
        input_ids = np.concatenate(
            [
                [self._sv.speech_start_id],
                self._sv.tokens_from_codes(codes.astype(np.int64)),
            ]
        ).astype(np.int32)
        generated = self._generate(input_ids, inference_settings)
        gen_codes = self._sv.codes_from_tokens(generated)
        all_codes = np.concatenate([codes.astype(np.int64), gen_codes])
        wav = self._audio_decoder.decode(all_codes)
        prompt_samples = int(
            len(codes)
            / self._audio_decoder.token_rate
            * self._audio_decoder.sample_rate
        )
        return wav[:, prompt_samples:]
