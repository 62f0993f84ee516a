"""End-to-end synthesis pipeline test with tiny random models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.core import tokenization
from tts_max_tpu.inference.synthesize import (
    InferenceSettings,
    LocalTtsModel,
)
from tts_max_tpu.models import llama
from tts_max_tpu.models.codec import api, encoder as enc, vocos


@pytest.fixture(scope="module")
def pipeline():
    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    lm_cfg = llama.tiny_config(vocab_size=len(tok), max_seq_len=512)
    lm_params = llama.init_params(jax.random.PRNGKey(0), lm_cfg)

    dec_cfg = vocos.tiny_vocos_config()
    dec_params = vocos.init_decoder(jax.random.PRNGKey(1), dec_cfg)
    decoder = api.AudioDecoder(dec_params, dec_cfg, api.DecoderConfig())

    enc_cfg = enc.tiny_encoder_config()
    enc_params = enc.init_encoder(jax.random.PRNGKey(2), enc_cfg)

    def fake_semantic(wav):
        t = wav.shape[1] // 320
        return jnp.zeros((wav.shape[0], t, enc_cfg.semantic_input_dim))

    encoder = api.CachingAudioEncoder(
        api.AudioEncoder(enc_params, enc_cfg, fake_semantic)
    )
    model = LocalTtsModel(lm_params, lm_cfg, tok, sv, encoder, decoder)
    return model, encoder, decoder


def test_synthesize_speech(pipeline):
    model, encoder, decoder = pipeline
    prompt_wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    settings = InferenceSettings(max_tokens=24, seed=0)
    res = model.synthesize_speech(
        settings,
        text_to_synthesize="hello there",
        prompt_id="p1",
        prompt_wav=prompt_wav,
        audio_prompt_transcription="reference speech",
    )
    assert res.wav.ndim == 2
    # wav length is a multiple of hop (320); prompt region trimmed
    assert res.wav.shape[1] % 320 == 0
    assert np.isfinite(res.wav).all()
    assert res.encoding_time > 0 and res.inference_time > 0

    # prompt encoding is cached: second call must not re-encode
    res2 = model.synthesize_speech(
        settings, "again", "p1", prompt_wav, "reference speech"
    )
    assert np.isfinite(res2.wav).all()


def test_synthesize_voice_description_skips_audio_prompt(pipeline):
    model, _, _ = pipeline
    settings = InferenceSettings(max_tokens=16, seed=1)
    res = model.synthesize_speech(
        settings,
        text_to_synthesize="describe voice",
        prompt_id="p2",
        prompt_wav=np.zeros(6400, dtype=np.float32),
        audio_prompt_transcription="",
        voice_description="a calm narrator",
        enable_instruction=False,
    )
    assert res.encoding_time == 0.0  # no audio-prompt encode
    assert np.isfinite(res.wav).all()


def test_complete_prompt(pipeline):
    model, _, decoder = pipeline
    prompt_wav = np.random.default_rng(0).standard_normal(9600).astype(np.float32)
    wav = model.complete_prompt(prompt_wav, InferenceSettings(max_tokens=12, seed=2))
    assert wav.ndim == 2
    assert wav.shape[1] % 320 == 0
    assert np.isfinite(wav).all()
