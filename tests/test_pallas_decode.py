"""Ragged decode-attention kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.ops.attention import decode_attention
from tts_max_tpu.ops.pallas_decode import ragged_decode_attention


@pytest.mark.parametrize("max_len", [128, 200, 384])
def test_ragged_matches_reference(max_len):
    b, hq, hkv, d = 4, 8, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(max_len), 3)
    q = jax.random.normal(ks[0], (b, hq, d))
    k = jax.random.normal(ks[1], (b, max_len, hkv, d))
    v = jax.random.normal(ks[2], (b, max_len, hkv, d))
    lengths = jnp.array([1, 17, max_len // 2, max_len], dtype=jnp.int32)
    ref = decode_attention(q, k, v, lengths)
    ours = ragged_decode_attention(q, k, v, lengths, block_k=128)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_ragged_bf16():
    b, hq, hkv, d = 2, 4, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, d), dtype=jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, 256, hkv, d), dtype=jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, 256, hkv, d), dtype=jnp.bfloat16)
    lengths = jnp.array([30, 250], dtype=jnp.int32)
    ref = decode_attention(q, k, v, lengths)
    ours = ragged_decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(
        np.asarray(ours, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        atol=3e-2,
    )


def test_ragged_ignores_garbage_beyond_length():
    b, hq, hkv, d = 1, 2, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, hq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, 128, hkv, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, 128, hkv, d))
    lengths = jnp.array([10], dtype=jnp.int32)
    out1 = ragged_decode_attention(q, k, v, lengths)
    # poison everything beyond the valid length
    k2 = k.at[:, 10:].set(1e4)
    v2 = v.at[:, 10:].set(-1e4)
    out2 = ragged_decode_attention(q, k2, v2, lengths)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


from tts_max_tpu.ops.pallas_decode import flash_decode_attention


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("t", [64, 192, 256])
def test_flash_decode_matches_reference(quantized, t):
    """flash_decode_attention == decode_attention oracle (fp32, ragged
    lengths, incl. the never-DMA'd-chunk NaN guard)."""
    rng = np.random.default_rng(3)
    b, hkv, d, hq = 4, 2, 64, 8
    k = rng.normal(size=(b, t, hkv, d)).astype(np.float32)
    v = rng.normal(size=(b, t, hkv, d)).astype(np.float32)
    if quantized:
        ks = rng.uniform(0.5, 1.5, size=(b, t, hkv)).astype(np.float32)
        k_cache = {"q": jnp.asarray(k).astype(jnp.int8),
                   "scale": jnp.asarray(ks)}
        v_cache = {"q": jnp.asarray(v).astype(jnp.int8),
                   "scale": jnp.asarray(ks * 0.7)}
    else:
        k_cache, v_cache = jnp.asarray(k), jnp.asarray(v)
    q = jnp.asarray(rng.normal(size=(b, hq, d)).astype(np.float32))
    lengths = jnp.asarray([1, t // 3, t, 7], jnp.int32)
    ref = decode_attention(q, k_cache, v_cache, lengths)
    out = flash_decode_attention(q, k_cache, v_cache, lengths,
                                 chunk=64, interpret=True)
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_decode_stacked_layer():
    """Stacked [L, B, T, Hkv, D] form with a traced layer index matches the
    per-layer oracle (the engine layer-scan case)."""
    rng = np.random.default_rng(4)
    L, b, t, hkv, d, hq = 3, 2, 128, 2, 64, 8
    k = jnp.asarray(rng.normal(size=(L, b, t, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, b, t, hkv, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, hq, d)).astype(np.float32))
    lengths = jnp.asarray([5, 100], jnp.int32)
    for layer in range(L):
        ref = decode_attention(q, k[layer], v[layer], lengths)
        out = flash_decode_attention(
            q, k, v, lengths, layer=jnp.int32(layer), chunk=64,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)


def test_decode_step_flash_matches_xla():
    """decode_step(flash=True) through the full layer scan matches the XLA
    attention path (bf16 tolerance)."""
    from tts_max_tpu.models import llama

    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    for quant in (False, True):
        cache = llama.init_kv_cache(cfg, 2, 64, quantized=quant)
        toks = jnp.asarray([11, 23], jnp.int32)
        lengths = jnp.asarray([5, 9], jnp.int32)
        l_x, c_x = llama.decode_step(params, cfg, cache, toks, lengths)
        l_f, c_f = llama.decode_step(params, cfg, cache, toks, lengths,
                                     flash=True)
        np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_x),
                                   atol=2e-2)
        for a, b_ in zip(jax.tree.leaves(c_x), jax.tree.leaves(c_f)):
            # int8 leaves: bf16 attention noise in h can flip a later
            # layer's quantized write by one step
            atol = 1.01 if a.dtype == jnp.int8 else 2e-2
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                rtol=2e-2, atol=atol,
            )


def test_xla_dense_decode_attention_matches():
    """decode_attention_dense (pure-XLA block-diagonal MXU form) == the
    grouped-einsum oracle, fp32 + int8 caches."""
    from tts_max_tpu.ops.attention import (
        decode_attention,
        decode_attention_dense,
    )

    rng = np.random.default_rng(7)
    b, t, hkv, d, hq = 4, 96, 2, 64, 8
    k = rng.normal(size=(b, t, hkv, d)).astype(np.float32)
    v = rng.normal(size=(b, t, hkv, d)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(b, hq, d)).astype(np.float32))
    lengths = jnp.asarray([1, 40, 96, 17], jnp.int32)
    ref = decode_attention(q, jnp.asarray(k), jnp.asarray(v), lengths)
    out = decode_attention_dense(q, jnp.asarray(k), jnp.asarray(v), lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    ks = rng.uniform(0.5, 1.5, size=(b, t, hkv)).astype(np.float32)
    kc = {"q": jnp.asarray(k).astype(jnp.int8), "scale": jnp.asarray(ks)}
    vc = {"q": jnp.asarray(v).astype(jnp.int8),
          "scale": jnp.asarray(ks * 0.7)}
    ref = decode_attention(q, kc, vc, lengths)
    out = decode_attention_dense(q, kc, vc, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_prewrite_attention_matches_postwrite():
    """decode_attention_prewrite(cache_pre, k_new, v_new) == write-then-
    attend (exact with an fp cache; the engine's in-place-scatter fix)."""
    from tts_max_tpu.ops.attention import (
        decode_attention,
        decode_attention_prewrite,
    )

    rng = np.random.default_rng(11)
    b, t, hkv, d, hq = 3, 64, 2, 32, 8
    k = rng.normal(size=(b, t, hkv, d)).astype(np.float32)
    v = rng.normal(size=(b, t, hkv, d)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(b, hq, d)).astype(np.float32))
    k_new = rng.normal(size=(b, hkv, d)).astype(np.float32)
    v_new = rng.normal(size=(b, hkv, d)).astype(np.float32)
    lengths = np.asarray([5, 63, 17], np.int32)  # BEFORE the new token
    kp, vp = k.copy(), v.copy()
    for i, n in enumerate(lengths):
        kp[i, n] = k_new[i].reshape(hkv, d)
        vp[i, n] = v_new[i].reshape(hkv, d)
    ref = decode_attention(
        q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(lengths + 1)
    )
    out = decode_attention_prewrite(
        q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        jnp.asarray(k_new), jnp.asarray(v_new),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decode_step_prewrite_matches():
    """decode_step(prewrite=True) == the post-write path through the layer
    scan (exact for an fp cache; the written cache rows are identical)."""
    from tts_max_tpu.models import llama

    cfg = llama.tiny_config(vocab_size=64, max_seq_len=128)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    cache = llama.init_kv_cache(cfg, 2, 64)
    toks = jnp.asarray([11, 23], jnp.int32)
    lengths = jnp.asarray([5, 9], jnp.int32)
    l_x, c_x = llama.decode_step(params, cfg, cache, toks, lengths)
    l_p, c_p = llama.decode_step(params, cfg, cache, toks, lengths,
                                 prewrite=True)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x), atol=2e-2)
    for a, b_ in zip(jax.tree.leaves(c_x), jax.tree.leaves(c_p)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=2e-2, atol=2e-2,
        )
