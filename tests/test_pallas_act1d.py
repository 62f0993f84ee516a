"""Fused Pallas Activation1d kernel (ops/pallas_act1d.py) vs the pinned
polyphase formulation — interpret mode on CPU; the TPU Mosaic build is
exercised by tools/bench_codec.py on the real chip."""

import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.models.codec.filters import activation1d, activation1d_fused
from tts_max_tpu.ops.pallas_act1d import activation1d_pallas


@pytest.mark.parametrize(
    "b,t,c,tb",
    [
        (2, 64, 4, 32),     # multi-block, tiny channels
        (1, 100, 8, 32),    # ragged tail
        (3, 513, 16, 128),  # odd T, multi-block
        (2, 31, 4, 32),     # single partial block
        (1, 8, 4, 32),      # T smaller than any block
    ],
)
def test_matches_fused_reference(b, t, c, tb):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    p = {
        "alpha": jnp.asarray(rng.standard_normal(c), jnp.float32) * 0.3,
        "beta": jnp.asarray(rng.standard_normal(c), jnp.float32) * 0.3,
    }
    want = activation1d_fused(x, p)
    got = activation1d_pallas(x, p, tb=tb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_matches_unfused_conv_path():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 200, 8)), jnp.float32)
    p = {
        "alpha": jnp.asarray(rng.standard_normal(8), jnp.float32) * 0.2,
        "beta": jnp.asarray(rng.standard_normal(8), jnp.float32) * 0.2,
    }
    want = activation1d(x, p, fused=False)
    got = activation1d_pallas(x, p, tb=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_env_gate_routes_through_pallas(monkeypatch):
    """With TTS_MAX_PALLAS_ACT1D=1 on a non-cpu backend the dispatcher
    would take the Pallas path; on CPU the polyphase path stays."""
    monkeypatch.setenv("TTS_MAX_PALLAS_ACT1D", "1")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 50, 4)), jnp.float32)
    p = {"alpha": jnp.zeros(4, jnp.float32), "beta": jnp.zeros(4, jnp.float32)}
    # CPU backend: gate must NOT reroute (kernel is TPU-targeted)
    out = activation1d(x, p)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(activation1d_fused(x, p)), atol=1e-6
    )
