"""Whisper ASR golden parity tests vs the installed HF torch implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tts_max_tpu.models import whisper

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_config(cfg: whisper.WhisperConfig):
    from transformers import WhisperConfig as HFWhisperConfig

    return HFWhisperConfig(
        vocab_size=cfg.vocab_size,
        num_mel_bins=cfg.n_mels,
        d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.ffn_dim,
        decoder_ffn_dim=cfg.ffn_dim,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        decoder_start_token_id=cfg.decoder_start_token_id,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.eos_token_id,
        bos_token_id=cfg.decoder_start_token_id,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        use_cache=True,
    )


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import WhisperForConditionalGeneration

    cfg = whisper.tiny_whisper_config()
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(_hf_config(cfg)).eval()
    params = whisper.import_hf_state_dict(model.state_dict(), cfg)
    return cfg, model, params


def _mel(cfg, batch=2, frames=None):
    frames = frames or 2 * cfg.max_source_positions
    rng = np.random.default_rng(0)
    return rng.standard_normal((batch, frames, cfg.n_mels)).astype(np.float32)


def test_encoder_parity(hf_pair):
    cfg, model, params = hf_pair
    mel = _mel(cfg)
    with torch.no_grad():
        # HF layout: [B, n_mels, T]
        ref = model.model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    ours = np.asarray(whisper.encode(params, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_decoder_logits_parity(hf_pair):
    cfg, model, params = hf_pair
    mel = _mel(cfg)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, (2, 7))
    with torch.no_grad():
        ref = model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()
    enc = whisper.encode(params, cfg, jnp.asarray(mel))
    ours = np.asarray(whisper.decoder_forward(params, cfg, jnp.asarray(tokens), enc))
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_greedy_decode_matches_hf_generate(hf_pair):
    cfg, model, params = hf_pair
    mel = _mel(cfg, batch=2)
    max_len = 16
    prompt = np.full((2, 1), cfg.decoder_start_token_id, dtype=np.int32)
    model.generation_config.forced_decoder_ids = None
    model.generation_config.begin_suppress_tokens = None
    model.generation_config.suppress_tokens = None
    with torch.no_grad():
        ref = model.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            max_length=max_len,
            do_sample=False,
            num_beams=1,
        ).numpy()
    enc = whisper.encode(params, cfg, jnp.asarray(mel))
    tokens, lengths = jax.jit(
        whisper.greedy_decode, static_argnums=(1, 4)
    )(params, cfg, enc, jnp.asarray(prompt), max_len)
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    for b in range(2):
        ref_b = ref[b]
        # newer transformers strips the decoder start token from the output
        off = 0 if ref_b[0] == cfg.decoder_start_token_id else 1
        # HF stops the whole batch together; compare up to our eos
        n = min(lengths[b] + 1 - off, ref_b.shape[0], max_len - off)
        np.testing.assert_array_equal(tokens[b, off : off + n], ref_b[:n])


def test_greedy_decode_respects_multi_token_prompt(hf_pair):
    cfg, model, params = hf_pair
    mel = _mel(cfg, batch=1)
    enc = whisper.encode(params, cfg, jnp.asarray(mel))
    prompt = jnp.asarray([[cfg.decoder_start_token_id, 5, 9]], dtype=jnp.int32)
    tokens, _ = whisper.greedy_decode(params, cfg, enc, prompt, 12)
    np.testing.assert_array_equal(np.asarray(tokens)[0, :3], [1, 5, 9])


def test_log_mel_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    fe = WhisperFeatureExtractor(feature_size=80)
    ref = fe(
        [w for w in wav], sampling_rate=16000, return_tensors="np", padding="max_length"
    )["input_features"]  # [B, 80, 3000]
    padded = np.stack([whisper.pad_or_trim(w) for w in wav])
    ours = np.asarray(whisper.log_mel_spectrogram(jnp.asarray(padded), 80))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-4)


def test_transcribe_fn_integration(hf_pair):
    """make_transcribe_fn plugs into reward_utils.eval_wer end-to-end."""
    cfg, _, params = hf_pair
    from tts_max_tpu.training.rlhf import asr, reward_utils

    detok = lambda ids: " ".join(f"tok{i}" for i in ids)
    fn = asr.make_transcribe_fn(
        params, cfg, detokenize_fn=detok, max_len=8, language_token_ids={}
    )
    wav = np.random.default_rng(3).standard_normal(8000).astype(np.float32) * 0.05
    wer = reward_utils.eval_wer(fn, wav, 16000, "tok1 tok2", "en")
    assert 0.0 <= wer


def test_init_params_shapes_roundtrip():
    cfg = whisper.tiny_whisper_config()
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 2 * cfg.max_source_positions, cfg.n_mels))
    enc = whisper.encode(params, cfg, mel)
    assert enc.shape == (1, cfg.max_source_positions, cfg.d_model)
    logits = whisper.decoder_forward(params, cfg, jnp.zeros((1, 4), jnp.int32), enc)
    assert logits.shape == (1, 4, cfg.vocab_size)
