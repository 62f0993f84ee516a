"""RLHF tests: WER math, rewards, GRPO advantages/loss/training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.core import tokenization
from tts_max_tpu.core.config import RLHFConfig
from tts_max_tpu.models import llama
from tts_max_tpu.models.codec import api, vocos
from tts_max_tpu.training.rlhf import grpo, reward_utils, rewards
from tts_max_tpu.training.rlhf.dataset import TtsRLHFDataset
from tts_max_tpu.data.samples import Sample


def test_wer_cer():
    assert reward_utils.word_error_rate("a b c", "a b c") == 0.0
    assert reward_utils.word_error_rate("a b c", "a x c") == pytest.approx(1 / 3)
    assert reward_utils.word_error_rate("a b", "a b c") == pytest.approx(0.5)
    assert reward_utils.char_error_rate("abc", "axc") == pytest.approx(1 / 3)
    assert reward_utils.normalize_wer(0.0) == 1.0
    assert reward_utils.normalize_wer(1.0) == pytest.approx(np.exp(-2.5))


def test_transcript_normalization():
    out = reward_utils.normalize_transcript("Hello, World!  How are you?", "en")
    assert out == "hello world how are you"
    # CJK: spaces removed, CJK punctuation stripped
    out_zh = reward_utils.normalize_transcript("你好， 世界。", "zh")
    assert out_zh == "你好世界"


def test_eval_wer_with_fake_asr():
    wav = np.random.default_rng(0).standard_normal(1600).astype(np.float32)
    wer = reward_utils.eval_wer(
        lambda a, lang: "hello world", wav, 16000, "Hello, world!", "en"
    )
    assert wer == 0.0
    assert reward_utils.eval_wer(
        lambda a, lang: "", np.zeros(0), 16000, "x", "en"
    ) == reward_utils.DEFAULT_WER


@pytest.fixture(scope="module")
def decoder():
    cfg = vocos.tiny_vocos_config()
    return api.AudioDecoder(
        vocos.init_decoder(jax.random.PRNGKey(0), cfg), cfg, api.DecoderConfig()
    )


def test_wer_reward_func(decoder):
    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    func = rewards.WERRewardFunc(
        decoder, speech_vocab=sv, transcribe_fn=lambda a, lang: "target words"
    )
    completions = [sv.tokens_from_codes(np.array([1, 2, 3, 4, 5]))]
    out = func(
        completions,
        prompt_speech_ids=[np.array([7, 8])],
        completion_truth=["target words"],
        language=["en"],
    )
    assert out == [pytest.approx(1.0)]  # perfect ASR match -> exp(0)
    # string completions also work (vLLM-style path)
    out2 = func(
        ["<|s_1|><|s_2|>"],
        prompt_speech_ids=[np.array([7])],
        completion_truth=["different truth"],
        language=["en"],
    )
    assert 0 < out2[0] <= 1.0


def test_similarity_reward_spectral_fallback(decoder, tmp_path):
    from tts_max_tpu.data.audio_io import save_wav

    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    wav_path = str(tmp_path / "p.wav")
    save_wav(wav_path, np.sin(np.arange(16000) / 20).astype(np.float32), 16000)
    func = rewards.SimilarityRewardFunc(decoder, speech_vocab=sv)
    out = func(
        [sv.tokens_from_codes(np.array([3, 4, 5, 6]))],
        prompt_speech_ids=[np.array([1, 2])],
        prompt_wav_path=[wav_path],
    )
    assert 0.0 <= out[0] <= 1.0


def test_compute_advantages():
    r = np.array([1.0, 3.0, 2.0, 2.0])  # two groups of G=2
    adv = grpo.compute_advantages(r, 2, scale_rewards=False)
    np.testing.assert_allclose(adv, [-1.0, 1.0, 0.0, 0.0])
    adv_s = grpo.compute_advantages(r, 2, scale_rewards=True)
    np.testing.assert_allclose(adv_s[:2], [-1.0, 1.0], atol=1e-3)


def test_grpo_loss_direction():
    """Positive advantage must push the completion's logprob up."""
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (2, 12)), dtype=jnp.int32
    )
    mask = jnp.zeros((2, 12), dtype=bool).at[:, 6:].set(True)
    adv = jnp.array([1.0, -1.0])

    loss, mean_logp = grpo.grpo_loss(params, tokens, mask, adv, None, cfg=cfg)
    grads = jax.grad(
        lambda p: grpo.grpo_loss(p, tokens, mask, adv, None, cfg=cfg)[0]
    )(params)
    # gradient step should increase logp of advantaged completion
    # (small lr to stay in the linear regime; rows share parameters)
    lr = 1e-2
    p2 = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    lp1 = grpo.sequence_logprobs(params, cfg, tokens)
    lp2 = grpo.sequence_logprobs(p2, cfg, tokens)
    m = np.asarray(mask[:, 1:])
    d0 = (np.asarray(lp2[0]) - np.asarray(lp1[0]))[m[0]].mean()
    d1 = (np.asarray(lp2[1]) - np.asarray(lp1[1]))[m[1]].mean()
    assert d0 > 0 > d1


def test_grpo_kl_penalty_is_zero_at_ref():
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((1, 8), dtype=jnp.int32)
    mask = jnp.ones((1, 8), dtype=bool)
    ref_logps = grpo.sequence_logprobs(params, cfg, tokens)
    loss_nokl, _ = grpo.grpo_loss(
        params, tokens, mask, jnp.zeros((1,)), None, cfg=cfg, beta=0.0
    )
    loss_kl, _ = grpo.grpo_loss(
        params, tokens, mask, jnp.zeros((1,)), ref_logps, cfg=cfg, beta=0.1
    )
    np.testing.assert_allclose(float(loss_kl), float(loss_nokl), atol=1e-6)


def test_grpo_trainer_end_to_end(decoder):
    """Full GRPO iteration with a constant-reward stub (smoke, tiny model)."""
    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    cfg = llama.tiny_config(vocab_size=len(tok), max_seq_len=512)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    class StubReward:
        __name__ = "stub"

        def __call__(self, completions, **kw):
            return [float(len(c)) for c in completions]  # length reward

    rlhf_cfg = RLHFConfig(num_generations=2, max_completion_length=8,
                          max_prompt_length=64)
    trainer = grpo.GRPOTrainer(
        params, cfg, tok, sv, [StubReward()], rlhf_cfg, learning_rate=1e-4
    )
    samples = [
        Sample.from_json(
            {"wav_path": f"w{i}.wav", "transcript": f"text {i}", "language": "en",
             "duration": 1.0, "sample_rate": 16000},
            "ds",
        )
        for i in range(3)
    ]
    codes = np.arange(30, dtype=np.int32) % 65536
    ds = TtsRLHFDataset("ds", samples, codes, [(0, 10), (10, 20), (20, 30)], tok)
    item = ds[0]
    assert item["completion_truth"] == "text 1"  # next sample's transcript
    assert item["prompt"].endswith("<|s_9|>")

    stats = trainer.train_step([ds[0], ds[1]])
    assert np.isfinite(stats["loss"])
    assert stats["step"] == 1
    assert "reward_mean" in stats and "completion_len" in stats
    stats2 = trainer.train_step([ds[1], ds[2]])
    assert stats2["step"] == 2


def test_grpo_trainer_constrained_rollouts():
    """constrain_to_speech: every completion token is a speech token or
    <|speech_end|> (no reward-crashing junk in the rollout)."""
    tok = tokenization.build_byte_tokenizer()
    sv = tokenization.speech_vocab(tok)
    lo, size = sv.generation_window()
    cfg = llama.tiny_config(vocab_size=len(tok), max_seq_len=512)
    params = llama.init_params(jax.random.PRNGKey(1), cfg)

    class StubReward:
        __name__ = "stub"

        def __call__(self, completions, **kw):
            return [1.0 for _ in completions]

    rlhf_cfg = RLHFConfig(num_generations=2, max_completion_length=6,
                          max_prompt_length=64, constrain_to_speech=True)
    trainer = grpo.GRPOTrainer(
        params, cfg, tok, sv, [StubReward()], rlhf_cfg, learning_rate=1e-4
    )
    samples = [
        Sample.from_json(
            {"wav_path": f"w{i}.wav", "transcript": f"t {i}", "language": "en",
             "duration": 1.0, "sample_rate": 16000},
            "ds",
        )
        for i in range(2)
    ]
    codes = np.arange(20, dtype=np.int32) % 65536
    ds = TtsRLHFDataset("ds", samples, codes, [(0, 10), (10, 20)], tok)
    batch, stats = trainer.rollout([ds[0]])
    comp = np.asarray(batch.tokens)[:, :]  # prompt+completion matrix
    m = np.asarray(batch.completion_mask).astype(bool)
    toks = comp[m]
    assert ((toks >= lo) & (toks < lo + size)).all()
    assert np.isfinite(batch.advantages).all()


def test_sequence_logprobs_chunked_matches_naive():
    """Blockwise GRPO logprobs == the naive full-vocab form (the chunked
    head is what lets the 1B GRPO update fit 16 GB on-chip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tts_max_tpu.models import llama
    from tts_max_tpu.training.rlhf.grpo import sequence_logprobs

    cfg = llama.tiny_config(vocab_size=128, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (3, 33), 0, 128)
    ref = sequence_logprobs(params, cfg, toks, chunk_size=0)
    for c in (8, 16, 64):
        out = sequence_logprobs(params, cfg, toks, chunk_size=c)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
