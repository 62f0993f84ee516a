"""int8 KV-cache tests (decode attention, generate, engine, cache helpers).

The reference delegates KV precision to vLLM (inferencing.py:75-92); here
int8 KV is a first-class cache layout ({"q", "scale"} leaves) understood by
prefill/decode_step/decode_attention (models/llama.py, ops/attention.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.inference.engine import InferenceEngine
from tts_max_tpu.inference.generate import generate
from tts_max_tpu.models import llama
from tts_max_tpu.ops.attention import decode_attention, decode_attention_bucketed
from tts_max_tpu.ops.sampling import SamplingParams


def _greedy_sp():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0,
                          frequency_penalty=0.0)


def _quantize_cache(cache):
    return {
        name: llama._quantize_kv(entry) for name, entry in cache.items()
    }


def test_decode_attention_quantized_close():
    """int8 KV attention output stays within per-channel quantization error
    of the fp path."""
    key = jax.random.PRNGKey(0)
    b, max_len, hkv, hq, d = 3, 32, 2, 4, 16
    kk, kv, kq = jax.random.split(key, 3)
    k_cache = jax.random.normal(kk, (b, max_len, hkv, d), jnp.float32)
    v_cache = jax.random.normal(kv, (b, max_len, hkv, d), jnp.float32)
    q = jax.random.normal(kq, (b, hq, d), jnp.float32)
    lengths = jnp.array([5, 32, 17], jnp.int32)

    ref = np.asarray(decode_attention(q, k_cache, v_cache, lengths))
    ours = np.asarray(
        decode_attention(
            q, llama._quantize_kv(k_cache), llama._quantize_kv(v_cache), lengths
        )
    )
    assert np.isfinite(ours).all()
    rel = np.abs(ours - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_decode_attention_bucketed_quantized():
    key = jax.random.PRNGKey(1)
    b, max_len, hkv, hq, d = 2, 64, 2, 4, 16
    k_cache = jax.random.normal(key, (b, max_len, hkv, d), jnp.float32)
    v_cache = jax.random.normal(key, (b, max_len, hkv, d), jnp.float32)
    q = jax.random.normal(key, (b, hq, d), jnp.float32)
    lengths = jnp.array([9, 40], jnp.int32)
    qk, qv = llama._quantize_kv(k_cache), llama._quantize_kv(v_cache)
    full = np.asarray(decode_attention(q, qk, qv, lengths))
    bucketed = np.asarray(
        decode_attention_bucketed(q, qk, qv, lengths, bucket=16)
    )
    np.testing.assert_allclose(bucketed, full, rtol=1e-5, atol=1e-5)


def test_generate_quantized_kv_matches_greedy():
    """Greedy generation with int8 KV matches the fp cache on a tiny model."""
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray(
        np.pad(np.array([5, 9, 42, 7, 3], np.int32), (0, 11))[None]
    )
    lens = jnp.asarray([5], jnp.int32)
    common = dict(sp=_greedy_sp(), max_new_tokens=10, eos_id=-1, cache_len=64)
    ref = generate(params, cfg, prompt, lens, jax.random.PRNGKey(0), **common)
    ours = generate(params, cfg, prompt, lens, jax.random.PRNGKey(0),
                    quantized_kv=True, **common)
    # int8 KV is lossy; on a tiny random model greedy tokens still agree
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(ours.tokens))


def test_engine_quantized_kv_matches():
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prompts = [np.array([1, 2, 3], np.int32),
               np.array([10, 20, 30, 40], np.int32)]
    fp = InferenceEngine(params, cfg, max_batch=2, max_len=128, sp=_greedy_sp())
    q8 = InferenceEngine(params, cfg, max_batch=2, max_len=128, sp=_greedy_sp(),
                         quantized_kv=True)
    ref = fp.generate_all(prompts, max_new_tokens=6, eos_id=-1)
    ours = q8.generate_all(prompts, max_new_tokens=6, eos_id=-1)
    for r, o in zip(ref, ours):
        np.testing.assert_array_equal(r.tokens, o.tokens)


def test_grow_cache_preserves_content():
    cfg = llama.tiny_config(vocab_size=32, max_seq_len=64)
    for quantized in (False, True):
        cache = llama.init_kv_cache(cfg, 2, 16, quantized=quantized)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        toks = jnp.zeros((2, 8), jnp.int32)
        lens = jnp.full((2,), 8, jnp.int32)
        _, cache = llama.prefill(params, cfg, toks, lens, cache)
        grown = llama.grow_cache(cache, 24)
        assert llama.cache_max_len(grown) == 24
        ref_k = cache["k"]["q"] if quantized else cache["k"]
        new_k = grown["k"]["q"] if quantized else grown["k"]
        np.testing.assert_array_equal(np.asarray(new_k[:, :, :16]),
                                      np.asarray(ref_k))
        assert not np.asarray(new_k[:, :, 16:]).any()
        with pytest.raises(ValueError):
            llama.grow_cache(grown, 8)


def test_int8_weights_plus_int8_kv():
    """Both quantizations compose: int8 weights + int8 KV cache."""
    from tts_max_tpu.models import quantization as quant

    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = quant.quantize_llama_params(
        llama.init_params(jax.random.PRNGKey(0), cfg)
    )
    engine = InferenceEngine(params, cfg, max_batch=2, max_len=64,
                             sp=_greedy_sp(), quantized_kv=True)
    done = engine.generate_all([np.array([3, 4, 5], np.int32)],
                               max_new_tokens=5, eos_id=-1)
    assert len(done) == 1 and len(done[0].tokens) == 5
