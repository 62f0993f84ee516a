"""DSP op tests: STFT parity vs torch, ISTFT roundtrip, overlap-add, mel bank."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.ops import stft as dsp


def _rand_wav(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((1, n)).astype(np.float32)


def test_hann_matches_torch():
    import torch

    np.testing.assert_allclose(
        dsp.hann_window(1280), torch.hann_window(1280).numpy(), atol=1e-6
    )


@pytest.mark.parametrize("n_fft,hop", [(256, 64), (1280, 320), (512, 128)])
def test_stft_matches_torch(n_fft, hop):
    import torch

    x = _rand_wav(4000)
    ours = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        return_complex=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_overlap_add_matches_naive():
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((2, 7, 64)).astype(np.float32)
    hop = 16
    ours = np.asarray(dsp.overlap_add(jnp.asarray(frames), hop))
    # naive fold
    out_len = 6 * hop + 64
    naive = np.zeros((2, out_len), dtype=np.float32)
    for t in range(7):
        naive[:, t * hop : t * hop + 64] += frames[:, t]
    np.testing.assert_allclose(ours, naive, atol=1e-5)


def test_istft_same_roundtrip():
    """stft -> istft_same reconstructs the signal (interior; edges are
    affected by the same-padding crop)."""
    n_fft, hop = 1280, 320
    x = _rand_wav(320 * 20)  # 20 frames
    # the 'same' istft expects spec frames covering T*hop samples:
    # build spec with center=True then trim to T frames
    spec = dsp.stft(jnp.asarray(x), n_fft, hop, center=True)
    # center-stft yields 1 + L/hop frames; same-istft of T frames -> T*hop
    y = np.asarray(dsp.istft_same(spec, n_fft, hop))
    # alignment: y[s] == x[s - hop/2] (center-pad n_fft/2 minus same-crop
    # pad (n_fft-hop)/2). Compare a 2000-sample interior window.
    off = hop // 2
    lo, hi = 2 * n_fft, 2 * n_fft + 2000
    np.testing.assert_allclose(y[:, lo:hi], x[:, lo - off : hi - off], atol=1e-4)


def test_mel_filterbank_properties():
    fb = dsp.mel_filterbank(16000, 1024, 80)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=0) > 0).all()
    # slaney norm: peak decreases with bandwidth growth at high freq
    assert fb.max() < 0.05


def test_mel_spectrogram_shapes():
    x = jnp.asarray(_rand_wav(16000))
    m = dsp.mel_spectrogram(x, 16000, 1024, 256, 80)
    assert m.shape == (1, 80, 1 + 16000 // 256)
    assert np.isfinite(np.asarray(m)).all()


def test_activation1d_fused_matches_unfused():
    """The single-fusion polyphase activation (filters.activation1d_fused)
    must be numerically identical to up2x -> SnakeBeta -> down2x."""
    from tts_max_tpu.models.codec import filters

    rng = np.random.default_rng(0)
    for T, C in [(1, 2), (2, 3), (7, 3), (64, 48), (333, 16)]:
        x = jnp.asarray(rng.standard_normal((2, T, C)), jnp.float32)
        p = {
            "alpha": jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.3,
            "beta": jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.3,
        }
        ref = filters.activation1d(x, p, fused=False)
        out = filters.activation1d_fused(x, p)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5
        )


def test_snake_impl_variants_match(monkeypatch):
    """TTS_MAX_SNAKE_IMPL experiments must match the fp32 reference:
    'transpose' exactly (same math, different layout), 'bf16'/'bf16t' to
    bf16 tolerance (downstream FSQ quantizes to 4 levels per dim)."""
    import numpy as np

    from tts_max_tpu.models.codec import filters

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 257, 48)).astype(np.float32))
    alpha = jnp.asarray(rng.normal(size=(48,)).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.normal(size=(48,)).astype(np.float32) * 0.3)
    ref = filters.snake_beta(x, alpha, beta)
    monkeypatch.setenv("TTS_MAX_SNAKE_IMPL", "transpose")
    np.testing.assert_allclose(
        np.asarray(filters.snake_beta(x, alpha, beta)),
        np.asarray(ref), rtol=0, atol=1e-6,
    )
    for impl in ("bf16", "bf16t"):
        monkeypatch.setenv("TTS_MAX_SNAKE_IMPL", impl)
        got = np.asarray(filters.snake_beta(x, alpha, beta))
        np.testing.assert_allclose(got, np.asarray(ref), atol=0.05)
