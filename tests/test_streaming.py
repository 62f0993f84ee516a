"""Streaming synthesis tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.core import tokenization
from tts_max_tpu.inference.engine import InferenceEngine
from tts_max_tpu.inference.streaming import StreamingDecoder, StreamingSynthesizer
from tts_max_tpu.models import llama
from tts_max_tpu.models.codec import api, vocos
from tts_max_tpu.ops.sampling import SamplingParams


@pytest.fixture(scope="module")
def decoder():
    cfg = vocos.tiny_vocos_config()
    return api.AudioDecoder(
        vocos.init_decoder(jax.random.PRNGKey(0), cfg), cfg, api.DecoderConfig()
    )


def test_streaming_decoder_length_and_convergence(decoder):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 65536, 120)
    full = decoder.decode(codes)[0]

    sd = StreamingDecoder(decoder, chunk_codes=20, context_codes=60,
                          crossfade_codes=4)
    pieces = []
    for i in range(0, 120, 10):
        pieces.append(sd.push(codes[i : i + 10]))
    pieces.append(sd.flush())
    out = np.concatenate(pieces)
    assert len(out) == len(full) == 120 * 320

    # interior samples converge to the offline decode given enough context
    # (compare the second half, well past startup transients)
    a, b = out[len(out) // 2 :], full[len(full) // 2 :]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


def test_streaming_decoder_incremental_availability(decoder):
    sd = StreamingDecoder(decoder, chunk_codes=10, context_codes=20,
                          crossfade_codes=2)
    # fewer than chunk+crossfade codes -> nothing yet
    assert len(sd.push(np.arange(5))) == 0
    # enough -> two full chunks emitted (25 codes, chunk 10, lookahead 2)
    out = sd.push(np.arange(20))
    assert len(out) == 20 * 320
    tail = sd.flush()
    assert len(tail) == 5 * 320


def test_streaming_synthesizer_end_to_end(decoder):
    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    cfg = llama.tiny_config(vocab_size=len(tok), max_seq_len=512)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(
        params, cfg, max_batch=2, max_len=256,
        sp=SamplingParams(temperature=0.8, top_k=50),
    )
    synth = StreamingSynthesizer(engine, tok, sv, decoder,
                                 chunk_codes=5, context_codes=10)
    from tts_max_tpu.core import prompting

    prompt = prompting.compile_inference_prompt("ref", "hello world", [1, 2, 3])
    chunks = list(synth.stream(prompt, max_new_tokens=30, seed=1))
    # generated tokens may include non-speech ids; whatever codes were
    # produced must have been vocoded incrementally
    total = sum(len(c) for c in chunks)
    assert total % 320 == 0
    assert all(np.isfinite(c).all() for c in chunks)
    assert not engine.has_work()


def test_streaming_decoder_history_conditions_but_never_emits(decoder):
    """``history`` codes (the voice prompt's) condition the decode context
    but are never emitted — matching the offline path's prompt-region trim."""
    rng = np.random.default_rng(1)
    hist = rng.integers(0, 65536, 40)
    codes = rng.integers(0, 65536, 60)

    sd = StreamingDecoder(decoder, chunk_codes=20, context_codes=50,
                          crossfade_codes=4, history=hist)
    out = np.concatenate([sd.push(codes), sd.flush()])
    assert len(out) == 60 * 320  # only the new codes' samples

    # against offline decode of [hist + codes] with the prompt trimmed:
    # interiors converge (the streaming context covers the full history)
    full = decoder.decode(np.concatenate([hist, codes]))[0][40 * 320:]
    a, b = out[len(out) // 2:], full[len(full) // 2:]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


def test_first_audio_before_completion(decoder):
    """TTFA property (round 5): the first audio chunk must be yielded
    while the streaming request is still generating — time-to-first-audio
    follows the chunk size, not the utterance length."""
    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    cfg = llama.tiny_config(vocab_size=len(tok), max_seq_len=512)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(
        params, cfg, max_batch=1, max_len=256, steps_per_dispatch=4,
        min_stage=32,
        sp=SamplingParams(temperature=0.8, top_k=50),
        vocab_window=sv.generation_window(),  # all-speech generation
    )
    synth = StreamingSynthesizer(engine, tok, sv, decoder,
                                 chunk_codes=5, context_codes=10)
    lo, _ = sv.generation_window()
    prompt_ids = np.arange(lo, lo + 8, dtype=np.int32)
    it = synth.stream("", max_new_tokens=120, seed=3, input_ids=prompt_ids)
    first = next(it)
    # the request is still mid-generation when the first chunk lands
    assert engine.has_work()
    active = [s for s in engine._slots if s.request is not None]
    assert active and len(active[0].generated) < 120
    assert len(first) > 0 and len(first) % 320 == 0
    rest = list(it)
    # a pipelined in-flight dispatch may remain (the synthesizer must not
    # drain a shared engine); the owner's serving loop clears it
    while engine.has_work():
        engine.poll()
    total = len(first) + sum(len(c) for c in rest)
    assert total % 320 == 0
