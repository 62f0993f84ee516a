"""Pallas flash attention tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.ops.attention import causal_attention, full_attention
from tts_max_tpu.ops.pallas_attention import flash_attention


def _qkv(b, s, hq, hkv, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, s, hq, d))
    k = jax.random.normal(ks[1], (b, s, hkv, d))
    v = jax.random.normal(ks[2], (b, s, hkv, d))
    return q, k, v


@pytest.mark.parametrize("s", [64, 128, 200, 256])
def test_flash_matches_reference_causal(s):
    q, k, v = _qkv(2, s, 4, 4, 32, seed=s)
    ours = flash_attention(q, k, v, causal=True, block_q=64, block_k=64)
    ref = causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_flash_gqa():
    q, k, v = _qkv(1, 128, 8, 2, 16, seed=1)
    ours = flash_attention(q, k, v, causal=True, block_q=64, block_k=64)
    ref = causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_flash_noncausal():
    q, k, v = _qkv(1, 96, 2, 2, 16, seed=2)  # 96 not a block multiple
    ours = flash_attention(q, k, v, causal=False, block_q=64, block_k=64)
    ref = full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match():
    q, k, v = _qkv(1, 128, 2, 2, 16, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(causal_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_flash_bf16():
    q, k, v = [x.astype(jnp.bfloat16) for x in _qkv(1, 128, 2, 2, 32, seed=4)]
    ours = flash_attention(q, k, v, block_q=64, block_k=64)
    ref = causal_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(ours, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        atol=3e-2,
    )
