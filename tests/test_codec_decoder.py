"""FSQ quantizer and Vocos decoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.models.codec import fsq, vocos


@pytest.fixture(scope="module")
def fsq_small():
    cfg = fsq.FSQConfig(dim=32)
    params = fsq.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_fsq_codebook_size(fsq_small):
    cfg, _ = fsq_small
    assert cfg.codebook_size == 65536
    assert cfg.codebook_dim == 8


def test_fsq_index_code_roundtrip(fsq_small):
    cfg, _ = fsq_small
    idx = jnp.arange(0, 65536, 97, dtype=jnp.int32)
    codes = fsq.indices_to_codes(idx, cfg)
    # codes live on the normalized grid {-1, -0.5, 0, 0.5}
    assert set(np.unique(np.asarray(codes))) <= {-1.0, -0.5, 0.0, 0.5}
    back = fsq.codes_to_indices(codes, cfg)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


def test_fsq_encode_decode_consistency(fsq_small):
    cfg, params = fsq_small
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.dim))
    out, idx = fsq.encode(params, x, cfg)
    assert idx.shape == (2, 5)
    assert idx.dtype == jnp.int32
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 65536).all()
    # decoding the indices must reproduce the quantized output exactly
    dec = fsq.decode_indices(params, idx, cfg)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(out), atol=1e-5)


def test_fsq_gradients_flow(fsq_small):
    """Straight-through estimator: gradients reach the input."""
    cfg, params = fsq_small

    def loss(x):
        out, _ = fsq.encode(params, x, cfg)
        return jnp.sum(out**2)

    g = jax.grad(loss)(jax.random.normal(jax.random.PRNGKey(2), (1, 3, cfg.dim)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_fsq_bound_range(fsq_small):
    cfg, _ = fsq_small
    z = jnp.linspace(-100, 100, 64).reshape(8, 8)
    b = np.asarray(fsq.bound(z, cfg))
    # levels=4: bounded to ~(-2.0015, 1.0015) so round() lands in {-2..1}
    assert (np.round(b) >= -2).all() and (np.round(b) <= 1).all()


# --- vocos decoder ----------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_decoder():
    cfg = vocos.tiny_vocos_config()
    params = vocos.init_decoder(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_decode_shapes(tiny_decoder):
    cfg, params = tiny_decoder
    codes = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 65536)
    wav = vocos.decode(params, codes, cfg)
    assert wav.shape == (2, 10 * cfg.hop_length)
    assert np.isfinite(np.asarray(wav)).all()


def test_decode_jit_and_deterministic(tiny_decoder):
    cfg, params = tiny_decoder
    codes = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 65536)
    f = jax.jit(lambda p, c: vocos.decode(p, c, cfg))
    w1, w2 = f(params, codes), f(params, codes)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))


def test_decoder_with_upsampler():
    from dataclasses import replace

    cfg = replace(
        vocos.tiny_vocos_config(),
        upsample_factors=(2, 3),
        upsample_kernel_sizes=(4, 5),  # k-u must be even for exact T*u output
        resnet_groups=2,
        hidden_dim=32,
    )
    params = vocos.init_decoder(jax.random.PRNGKey(0), cfg)
    codes = jnp.zeros((1, 6), dtype=jnp.int32)
    wav = vocos.decode(params, codes, cfg)
    # upsampler multiplies the time axis before the ISTFT head
    assert wav.shape == (1, 6 * 2 * 3 * cfg.hop_length)


def test_conv1d_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 8)).astype(np.float32)  # NWC
    w = rng.standard_normal((16, 8, 5)).astype(np.float32)  # torch [Cout,Cin,K]
    b = rng.standard_normal(16).astype(np.float32)
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        padding=2,
        dilation=1,
    ).numpy().transpose(0, 2, 1)
    p = {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}
    ours = np.asarray(vocos.conv1d(jnp.asarray(x), p, padding=2))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_conv_transpose1d_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 12, 6)).astype(np.float32)
    w = rng.standard_normal((6, 4, 8)).astype(np.float32)  # torch [Cin,Cout,K]
    b = rng.standard_normal(4).astype(np.float32)
    stride, pad = 3, 2
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=stride,
        padding=pad,
    ).numpy().transpose(0, 2, 1)
    p = {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}
    ours = np.asarray(vocos.conv_transpose1d(jnp.asarray(x), p, stride=stride, padding=pad))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)
