"""SpeechLM model tests: shapes, causality, KV-cache decode parity, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.models import llama
from tts_max_tpu.ops import sampling
from tts_max_tpu.parallel.sharding import params_shardings
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.tiny_config(vocab_size=512, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    logits = llama.forward(params, cfg, tokens)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_causality(tiny):
    cfg, params = tiny
    key = jax.random.PRNGKey(2)
    tokens = jax.random.randint(key, (1, 16), 0, cfg.vocab_size)
    logits1 = llama.forward(params, cfg, tokens)
    # perturb the future: change the last 4 tokens
    tokens2 = tokens.at[:, 12:].set((tokens[:, 12:] + 7) % cfg.vocab_size)
    logits2 = llama.forward(params, cfg, tokens2)
    np.testing.assert_allclose(
        np.asarray(logits1[:, :12]), np.asarray(logits2[:, :12]), atol=1e-4
    )
    assert not np.allclose(np.asarray(logits1[:, 12:]), np.asarray(logits2[:, 12:]))


def test_prefill_decode_matches_forward(tiny):
    """Teacher-forced decode through the KV cache must reproduce the full
    forward logits — the correctness anchor for AR generation."""
    cfg, params = tiny
    b, s = 2, 12
    tokens = jax.random.randint(jax.random.PRNGKey(3), (b, s), 0, cfg.vocab_size)
    full = llama.forward(params, cfg, tokens)

    prompt_len = 5
    lengths = jnp.full((b,), prompt_len, dtype=jnp.int32)
    cache = llama.init_kv_cache(cfg, b, max_len=s + 4, dtype=jnp.float32)
    last, cache = llama.prefill(params, cfg, tokens[:, :prompt_len], lengths, cache)
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(full[:, prompt_len - 1]), atol=2e-2, rtol=1e-2
    )
    # teacher-forced single steps
    for t in range(prompt_len, s):
        lengths = jnp.full((b,), t, dtype=jnp.int32)
        logits, cache = llama.decode_step(params, cfg, cache, tokens[:, t], lengths)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), atol=2e-2, rtol=1e-2
        )


def test_ragged_prefill_decode(tiny):
    """Unequal prompt lengths (right-padded): each row's decode must match its
    own unpadded forward."""
    cfg, params = tiny
    t0 = jax.random.randint(jax.random.PRNGKey(4), (1, 7), 0, cfg.vocab_size)
    t1 = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 0, cfg.vocab_size)
    batch = jnp.zeros((2, 7), dtype=jnp.int32)
    batch = batch.at[0].set(t0[0])
    batch = batch.at[1, :4].set(t1[0])
    lengths = jnp.array([7, 4], dtype=jnp.int32)

    cache = llama.init_kv_cache(cfg, 2, max_len=16, dtype=jnp.float32)
    last, cache = llama.prefill(params, cfg, batch, lengths, cache)
    ref0 = llama.forward(params, cfg, t0)[0, -1]
    ref1 = llama.forward(params, cfg, t1)[0, -1]
    np.testing.assert_allclose(np.asarray(last[0]), np.asarray(ref0), atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(last[1]), np.asarray(ref1), atol=2e-2, rtol=1e-2)

    # decode one token for each row; row 1 writes at its own position 4
    nxt = jnp.array([11, 13], dtype=jnp.int32)
    logits, cache = llama.decode_step(params, cfg, cache, nxt, lengths)
    ref0b = llama.forward(params, cfg, jnp.concatenate([t0, nxt[None, :1]], axis=1))[0, -1]
    ref1b = llama.forward(params, cfg, jnp.concatenate([t1, nxt[None, 1:]], axis=1))[0, -1]
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(ref0b), atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(ref1b), atol=2e-2, rtol=1e-2)


def test_untied_head():
    cfg = llama.tiny_config(vocab_size=128)
    cfg = llama.replace(cfg, tie_embeddings=False)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    assert "lm_head" in params
    tokens = jnp.zeros((1, 4), dtype=jnp.int32)
    assert llama.forward(params, cfg, tokens).shape == (1, 4, 128)


def test_param_shardings_stacked(mesh8, tiny):
    cfg, params = tiny
    sh = params_shardings(params, mesh8)
    wq = sh["layers"]["attn"]["wq"]["kernel"].spec
    # (L, dim=64, q=64): both trailing dims divisible by 2 -> sharded
    assert wq == P(None, "fsdp", "tensor")
    assert sh["layers"]["attn_norm"]["scale"].spec == P(None, None) or sh[
        "layers"
    ]["attn_norm"]["scale"].spec == P()


def test_architectures():
    cfg = llama.config_for_architecture("llama-1b")
    assert cfg.dim == 2048 and cfg.n_layers == 16 and cfg.tie_embeddings
    cfg8 = llama.config_for_architecture("llama-8b")
    assert cfg8.dim == 4096 and not cfg8.tie_embeddings
    with pytest.raises(ValueError):
        llama.config_for_architecture("gpt-j")


# --- sampling ----------------------------------------------------------------


def test_top_k_top_p():
    logits = jnp.array([[1.0, 2.0, 3.0, 4.0, 0.0]])
    masked = sampling.top_k_mask(logits, 2)
    assert np.isneginf(np.asarray(masked)[0, [0, 1, 4]]).all()
    assert np.isfinite(np.asarray(masked)[0, [2, 3]]).all()
    # top_p: keep smallest set with cum prob >= p; top token always kept
    masked_p = sampling.top_p_mask(logits, 0.5)
    a = np.asarray(masked_p)[0]
    assert np.isfinite(a[3])
    assert np.isneginf(a[[0, 1, 4]]).all()


def test_repetition_and_frequency_penalty():
    logits = jnp.array([[2.0, -2.0, 1.0]])
    counts = jnp.array([[1, 1, 0]])
    out = np.asarray(sampling.apply_repetition_penalty(logits, counts, 2.0))
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0]])
    gen_counts = jnp.array([[3, 0, 1]])
    out2 = np.asarray(sampling.apply_frequency_penalty(logits, gen_counts, 0.5))
    np.testing.assert_allclose(out2, [[0.5, -2.0, 0.5]])


def test_sample_token_greedy_and_counts():
    params = sampling.SamplingParams(temperature=0.0)
    logits = jnp.array([[0.0, 5.0, 1.0], [9.0, 0.0, 0.0]])
    toks = sampling.sample_token(jax.random.PRNGKey(0), logits, params)
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])
    counts = jnp.zeros((2, 3), dtype=jnp.int32)
    counts = sampling.update_counts(counts, toks)
    np.testing.assert_array_equal(np.asarray(counts), [[0, 1, 0], [1, 0, 0]])


def test_counts_from_tokens():
    tokens = jnp.array([[1, 1, 2, 0]])
    mask = jnp.array([[1, 1, 1, 0]], dtype=bool)
    counts = sampling.counts_from_tokens(tokens, mask, vocab=4)
    np.testing.assert_array_equal(np.asarray(counts), [[0, 2, 1, 0]])


def test_sampling_distribution_sane():
    params = sampling.SamplingParams(
        temperature=1.0, top_k=0, top_p=1.0, repetition_penalty=1.0, frequency_penalty=0.0
    )
    logits = jnp.log(jnp.array([[0.7, 0.2, 0.1]]))
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    draws = jax.vmap(lambda k: sampling.sample_token(k, logits, params))(keys)
    freq = np.bincount(np.asarray(draws).ravel(), minlength=3) / 500
    assert abs(freq[0] - 0.7) < 0.08
