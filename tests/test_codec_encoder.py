"""Codec encoder tests: alias-free filters (torch parity), snake, conv stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.models.codec import encoder as enc
from tts_max_tpu.models.codec import filters as flt


def test_kaiser_filter_matches_torch_window():
    import torch

    # same beta path as the reference (kaiser window + normalized sinc)
    taps = flt.kaiser_sinc_filter1d(0.25, 0.3, 12)
    assert taps.shape == (12,)
    np.testing.assert_allclose(taps.sum(), 1.0, atol=1e-6)
    tw = torch.kaiser_window(12, beta=flt.kaiser_beta(6, 0.3), periodic=False).numpy()
    np.testing.assert_allclose(np.kaiser(12, flt.kaiser_beta(6, 0.3)), tw, atol=1e-5)


def test_upsample1d_matches_torch_conv_transpose():
    """Our lhs-dilated formulation == reference's grouped conv_transpose."""
    import torch
    import torch.nn.functional as F

    ratio, ksize = 2, 12
    taps = flt.kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ksize)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 50, 3)).astype(np.float32)  # NWC

    # reference computation (filters.py:108-115) with torch ops
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    stride = ratio
    pad = ksize // ratio - 1
    pad_left = pad * stride + (ksize - stride) // 2
    pad_right = pad * stride + (ksize - stride + 1) // 2
    w = torch.from_numpy(taps).view(1, 1, -1).expand(3, -1, -1)
    xp = F.pad(xt, (pad, pad), mode="replicate")
    ref = ratio * F.conv_transpose1d(xp, w, stride=stride, groups=3)
    ref = ref[..., pad_left:-pad_right].numpy().transpose(0, 2, 1)

    ours = np.asarray(flt.upsample1d(jnp.asarray(x), ratio, ksize))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_downsample1d_matches_torch():
    import torch
    import torch.nn.functional as F

    ratio, ksize = 2, 12
    taps = flt.kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ksize)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 40, 2)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 2, 1))
    even = ksize % 2 == 0
    pl_, pr = ksize // 2 - int(even), ksize // 2
    xp = F.pad(xt, (pl_, pr), mode="replicate")
    w = torch.from_numpy(taps).view(1, 1, -1).expand(2, -1, -1)
    ref = F.conv1d(xp, w, stride=ratio, groups=2).numpy().transpose(0, 2, 1)
    ours = np.asarray(flt.downsample1d(jnp.asarray(x), ratio, ksize))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_snake_beta_math():
    x = jnp.asarray(np.linspace(-3, 3, 24).reshape(2, 3, 4), dtype=jnp.float32)
    alpha = jnp.zeros(4)
    beta = jnp.zeros(4)
    # logscale: alpha=beta=exp(0)=1 -> y = x + sin^2(x)
    y = np.asarray(flt.snake_beta(x, alpha, beta, logscale=True))
    expect = np.asarray(x) + np.sin(np.asarray(x)) ** 2 / (1 + 1e-9)
    np.testing.assert_allclose(y, expect, atol=1e-5)


def test_upsample_preserves_dc():
    """A constant signal must stay (approximately) constant through the
    anti-aliased up/down pair — the reason taps are sum-normalized."""
    x = jnp.ones((1, 64, 2))
    up = flt.upsample1d(x, 2)
    assert up.shape == (1, 128, 2)
    np.testing.assert_allclose(np.asarray(up)[:, 10:-10], 1.0, atol=1e-3)
    down = flt.downsample1d(up, 2)
    np.testing.assert_allclose(np.asarray(down)[:, 5:-5], 1.0, atol=1e-3)


# --- encoder stack ----------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_enc():
    cfg = enc.tiny_encoder_config()
    params = enc.init_encoder(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_encoder_hop(tiny_enc):
    cfg, _ = tiny_enc
    assert cfg.hop_length == 320


def test_acoustic_encoder_shapes(tiny_enc):
    cfg, params = tiny_enc
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 320 * 6))
    out = enc.acoustic_encoder(wav, params["acoustic"], cfg)
    assert out.shape == (2, 6, cfg.acoustic_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_features_shapes(tiny_enc):
    cfg, params = tiny_enc
    wav = jax.random.normal(jax.random.PRNGKey(2), (1, 320 * 5))
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.semantic_input_dim))
    codes = enc.encode_features(params, wav, feats, cfg)
    assert codes.shape == (1, 5)
    a = np.asarray(codes)
    assert (a >= 0).all() and (a < 65536).all()


def test_pad_wav_for_encode():
    wav = np.zeros((1, 700), dtype=np.float32)
    padded = enc.pad_wav_for_encode(wav)
    assert padded.shape[-1] == 960  # next hop multiple
    # exact multiple still gets a full extra hop (reference semantics)
    wav2 = np.zeros((1, 640), dtype=np.float32)
    assert enc.pad_wav_for_encode(wav2).shape[-1] == 960
