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
