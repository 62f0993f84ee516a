"""Codec roundtrip correctness gate (BASELINE.md gate #1).

With real xcodec2 weights (set ``XCODEC2_CHECKPOINT=/path/to.pt``), the
encode→decode roundtrip must reproduce the input waveform's mel spectrogram
closely. Without weights these tests validate the structural roundtrip on
random weights (codes decode to the right length/dtype) and skip the golden
comparison.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.models.codec import api, encoder as enc, vocos

XCODEC2 = os.environ.get("XCODEC2_CHECKPOINT", "")


def _sine(seconds=1.0, freq=220.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_structural_roundtrip_random_weights():
    """wav -> codes -> wav with the full-architecture codec (random init):
    shapes, rates, and determinism must hold end to end."""
    ecfg = enc.tiny_encoder_config()
    encoder = api.AudioEncoder(
        enc.init_encoder(jax.random.PRNGKey(0), ecfg),
        ecfg,
        lambda w: jnp.zeros(
            (w.shape[0], w.shape[1] // ecfg.hop_length, ecfg.semantic_input_dim)
        ),
    )
    dcfg = vocos.tiny_vocos_config()
    decoder = api.AudioDecoder(
        vocos.init_decoder(jax.random.PRNGKey(1), dcfg), dcfg, api.DecoderConfig()
    )
    wav = _sine(0.7)
    codes = encoder.encode(wav)
    # 0.7s -> padded to hop multiple + 1 extra frame (reference pad semantics)
    assert len(codes) == int(np.ceil((len(wav) + 1) / 320))
    out = decoder.decode(codes)
    assert out.shape == (1, len(codes) * 320)
    # determinism
    np.testing.assert_array_equal(codes, encoder.encode(wav))


@pytest.mark.skipif(not XCODEC2, reason="set XCODEC2_CHECKPOINT for golden gate")
def test_golden_roundtrip_with_real_weights():
    from tts_max_tpu.ops.stft import mel_spectrogram

    encoder = api.create_encoder(XCODEC2)
    decoder = api.create_decoder(XCODEC2)
    wav = _sine(2.0, 220.0) + _sine(2.0, 330.0) * 0.3
    codes = encoder.encode(wav)
    out = decoder.decode(codes)[0][: len(wav)]
    mel_in = np.asarray(mel_spectrogram(jnp.asarray(wav)[None], 16000, 1024, 256, 80))
    mel_out = np.asarray(mel_spectrogram(jnp.asarray(out)[None], 16000, 1024, 256, 80))
    # log-mel distance must be small for a trained codec
    dist = np.abs(
        np.log(np.maximum(mel_in, 1e-5)) - np.log(np.maximum(mel_out, 1e-5))
    ).mean()
    assert dist < 1.0, dist
