"""Streaming TTS: incremental codec decoding + chunked synthesis.

A capability beyond the reference (which always decodes the full code
sequence at the end, inferencing.py:152-159): audio is emitted while the
SpeechLM is still generating.

The Vocos decoder is non-causal (full attention over the code window), so
exact streaming is impossible; each chunk re-decodes with ``context`` codes
of left history and the overlap region linearly crossfades. With enough
context the interior converges to the offline decode (tested).

``StreamingSynthesizer`` drives the continuous-batching engine step by step
and yields wav chunks as soon as enough new codes exist — time-to-first-audio
is ~(chunk + context) / 50 s of generation instead of the full utterance.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class StreamingDecoder:
    """Incremental FSQ-codes → waveform with overlap crossfade."""

    def __init__(
        self,
        audio_decoder,
        chunk_codes: int = 25,
        context_codes: int = 50,
        crossfade_codes: int = 4,
        history=None,
    ):
        """``history``: codes that precede the stream (e.g. the voice-prompt
        audio's codes) — they condition the decode context but are never
        emitted, mirroring the offline path's prompt-region trim."""
        self._decoder = audio_decoder
        self.chunk = chunk_codes
        self.context = context_codes
        self.crossfade = crossfade_codes
        self._hop = audio_decoder.sample_rate // audio_decoder.token_rate
        self._codes: list[int] = (
            np.asarray(history, dtype=np.int64).ravel().tolist()
            if history is not None else []
        )
        self._emitted_codes = len(self._codes)
        self._tail: np.ndarray | None = None  # last crossfade region samples

    def push(self, codes) -> np.ndarray:
        """Add codes; return newly-ready audio samples (possibly empty)."""
        self._codes.extend(np.asarray(codes, dtype=np.int64).ravel().tolist())
        out = []
        while len(self._codes) - self._emitted_codes >= self.chunk + self.crossfade:
            out.append(self._decode_next(final=False))
        return np.concatenate(out) if out else np.zeros(0, dtype=np.float32)

    def flush(self) -> np.ndarray:
        """Decode whatever remains."""
        out = []
        while len(self._codes) > self._emitted_codes:
            out.append(self._decode_next(final=True))
        return np.concatenate(out) if out else np.zeros(0, dtype=np.float32)

    def _decode_next(self, final: bool) -> np.ndarray:
        start_emit = self._emitted_codes
        end_emit = (
            len(self._codes) if final else min(
                start_emit + self.chunk, len(self._codes)
            )
        )
        ctx_start = max(0, start_emit - self.context)
        # decode [ctx_start, end_emit + lookahead(crossfade)] and keep the
        # [start_emit, end_emit) region
        look_end = min(len(self._codes), end_emit + (0 if final else 0))
        window = np.asarray(self._codes[ctx_start:look_end], dtype=np.int64)
        wav = self._decoder.decode(window)[0]
        lo = (start_emit - ctx_start) * self._hop
        hi = (end_emit - ctx_start) * self._hop
        piece = wav[lo:hi].copy()
        # crossfade with the previous chunk's tail
        fade = self.crossfade * self._hop
        if self._tail is not None and len(piece) >= fade > 0:
            ramp = np.linspace(0.0, 1.0, fade, dtype=np.float32)
            piece[:fade] = ramp * piece[:fade] + (1 - ramp) * self._tail[:len(piece[:fade])]
        if not final and fade > 0 and hi + fade <= len(wav):
            self._tail = wav[hi : hi + fade].copy()
        else:
            self._tail = None
        self._emitted_codes = end_emit
        return piece.astype(np.float32)


class StreamingSynthesizer:
    """text (+ prompt) → iterator of wav chunks, driven by the engine."""

    def __init__(self, engine, tokenizer, speech_vocab, audio_decoder,
                 chunk_codes: int = 25, context_codes: int = 50):
        self._engine = engine
        self._tokenizer = tokenizer
        self._sv = speech_vocab
        self._decoder = audio_decoder
        self._chunk = chunk_codes
        self._context = context_codes

    def stream(
        self,
        prompt: str,
        max_new_tokens: int = 1792,
        seed: int = 0,
        input_ids: np.ndarray | None = None,
    ) -> Iterator[np.ndarray]:
        """``input_ids``: pre-tokenized prompt (skips the tokenizer —
        benchmark harnesses feed raw speech-token prompts)."""
        if input_ids is None:
            input_ids = np.asarray(
                self._tokenizer.encode(prompt, add_special_tokens=True),
                dtype=np.int32,
            )
        input_ids = np.asarray(input_ids, dtype=np.int32)
        rid = self._engine.submit(
            input_ids, max_new_tokens, eos_id=self._sv.speech_end_id,
            sampling_seed=seed,
        )
        sd = StreamingDecoder(self._decoder, self._chunk, self._context)
        n_consumed = 0
        done = False
        while not done:
            finished = self._engine.poll()
            done = any(c.request_id == rid for c in finished) or not (
                self._engine.has_work()
            )
            # read tokens generated so far for our slot
            slot_tokens = None
            for slot in self._engine._slots:
                if slot.request is not None and slot.request.request_id == rid:
                    slot_tokens = slot.generated
            if slot_tokens is None:  # finished
                for c in finished:
                    if c.request_id == rid:
                        slot_tokens = c.tokens.tolist()
            if slot_tokens is None:
                continue
            codes = self._sv.codes_from_tokens(
                np.asarray(slot_tokens[n_consumed:], dtype=np.int64)
            )
            # count consumed in token space (codes_from_tokens drops markers)
            n_consumed = len(slot_tokens)
            if len(codes):
                piece = sd.push(codes)
                if len(piece):
                    yield piece
        tail = sd.flush()
        if len(tail):
            yield tail
