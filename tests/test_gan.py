"""Codec GAN training tests: discriminators, losses, one full GAN step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.core.config import CodecTrainingConfig
from tts_max_tpu.models.codec import discriminator as disc
from tts_max_tpu.models.codec import losses, vocos
from tts_max_tpu.training.codec import gan


@pytest.fixture(scope="module")
def tiny_gan():
    vocos_cfg = vocos.tiny_vocos_config()
    mpd_cfg = disc.tiny_mpd_config()
    msd_cfg = disc.tiny_msd_config()
    gen_params = vocos.init_decoder(jax.random.PRNGKey(0), vocos_cfg)
    disc_params = {
        "mpd": disc.init_mpd(jax.random.PRNGKey(1), mpd_cfg),
        "msd": disc.init_msd(jax.random.PRNGKey(2), msd_cfg),
    }
    return vocos_cfg, mpd_cfg, msd_cfg, gen_params, disc_params


def test_mpd_shapes(tiny_gan):
    _, mpd_cfg, _, _, dp = tiny_gan
    wav = jax.random.normal(jax.random.PRNGKey(3), (2, 2000))
    outs = disc.mpd(wav, dp["mpd"], mpd_cfg)
    assert len(outs) == len(mpd_cfg.periods)
    for per_layer in outs:
        # layers + final flat logits
        assert len(per_layer) == len(mpd_cfg.downsample_scales) + 1
        assert per_layer[-1].ndim == 2
        assert np.isfinite(np.asarray(per_layer[-1])).all()


def test_msd_shapes(tiny_gan):
    _, _, msd_cfg, _, dp = tiny_gan
    wav = jax.random.normal(jax.random.PRNGKey(4), (1, 1600))
    outs = disc.msd(wav, dp["msd"], msd_cfg)
    assert len(outs) == len(msd_cfg.fft_sizes)
    for per_layer in outs:
        assert len(per_layer) == len(msd_cfg.downsample_scales) + 3
        assert np.isfinite(np.asarray(per_layer[-1])).all()


def test_lsgan_losses():
    real, fake = losses.disc_loss(jnp.ones((2, 3)), jnp.zeros((2, 3)))
    assert float(real) == 0.0 and float(fake) == 0.0  # perfect discriminator
    assert float(losses.gen_loss(jnp.ones((2, 3)))) == 0.0  # fooled
    r2, f2 = losses.disc_loss(jnp.zeros((2, 3)), jnp.ones((2, 3)))
    assert float(r2) == 1.0 and float(f2) == 1.0


def test_mel_loss_zero_for_identical():
    wav = jax.random.normal(jax.random.PRNGKey(5), (1, 4096))
    assert float(losses.multi_resolution_mel_loss(wav, wav)) == 0.0
    other = jax.random.normal(jax.random.PRNGKey(6), (1, 4096))
    assert float(losses.multi_resolution_mel_loss(wav, other)) > 0.1


def test_rms_loss():
    wav = jax.random.normal(jax.random.PRNGKey(7), (2, 1000))
    assert float(losses.rms_loss(wav, wav)) == 0.0
    # 2x amplitude = ~6.02 dB -> squared ~36.2
    np.testing.assert_allclose(
        float(losses.rms_loss(wav, 2 * wav)), (20 * np.log10(2)) ** 2, rtol=1e-4
    )


def test_stft_loss_matches_zero():
    wav = jax.random.normal(jax.random.PRNGKey(8), (1, 2048))
    assert float(losses.stft_loss(wav, wav, 512, 128, 512)) == 0.0


def test_gan_step_trains(tiny_gan):
    vocos_cfg, mpd_cfg, msd_cfg, gen_params, disc_params = tiny_gan
    cfg = CodecTrainingConfig(code_window_size=8)
    gen_trainable, gen_frozen = gan.split_generator_params(gen_params)
    gen_tx, disc_tx = gan.create_gan_optimizers(cfg)
    gen_opt = gen_tx.init(gen_trainable)
    disc_opt = disc_tx.init(disc_params)
    step = gan.make_gan_step(
        vocos_cfg, mpd_cfg, msd_cfg, cfg, gen_frozen, gen_tx, disc_tx
    )
    batch = {
        "audio_codes": jax.random.randint(jax.random.PRNGKey(9), (2, 8), 0, 65536),
        "wav": 0.1 * jax.random.normal(jax.random.PRNGKey(10), (2, 8 * 320)),
    }
    gt, dp, go, do, m1 = step(gen_trainable, disc_params, gen_opt, disc_opt, batch)
    assert np.isfinite(float(m1.gen_loss)) and np.isfinite(float(m1.disc_loss))
    # params actually changed; FSQ stayed frozen
    assert not np.allclose(
        np.asarray(gt["fc_post_a"]["kernel"]),
        np.asarray(gen_trainable["fc_post_a"]["kernel"]),
    )
    assert "quantizer" not in gt
    # a few more steps: disc loss should drop (it learns to separate)
    d0 = float(m1.disc_loss)
    for _ in range(4):
        gt, dp, go, do, m = step(gt, dp, go, do, batch)
    assert float(m.disc_loss) < d0
    assert np.isfinite(float(m.mel_loss))


def test_gan_step_sharded_matches(tiny_gan, mesh_dp):
    """Data-parallel GAN step on the 8-device mesh matches single-device."""
    vocos_cfg, mpd_cfg, msd_cfg, gen_params, disc_params = tiny_gan
    cfg = CodecTrainingConfig(code_window_size=8)
    gen_trainable, gen_frozen = gan.split_generator_params(gen_params)
    gen_tx, disc_tx = gan.create_gan_optimizers(cfg)
    gen_opt = gen_tx.init(gen_trainable)
    disc_opt = disc_tx.init(disc_params)
    batch = {
        "audio_codes": jax.random.randint(jax.random.PRNGKey(9), (8, 8), 0, 65536),
        "wav": 0.1 * jax.random.normal(jax.random.PRNGKey(10), (8, 8 * 320)),
    }
    plain = gan.make_gan_step(vocos_cfg, mpd_cfg, msd_cfg, cfg, gen_frozen,
                              gen_tx, disc_tx)
    sharded = gan.make_gan_step(vocos_cfg, mpd_cfg, msd_cfg, cfg, gen_frozen,
                                gen_tx, disc_tx, mesh=mesh_dp)
    _, _, _, _, m_ref = plain(gen_trainable, disc_params, gen_opt, disc_opt, batch)
    gt, dp, _, _, m = sharded(gen_trainable, disc_params, gen_opt, disc_opt, batch)
    np.testing.assert_allclose(float(m.gen_loss), float(m_ref.gen_loss), rtol=1e-4)
    np.testing.assert_allclose(float(m.disc_loss), float(m_ref.disc_loss), rtol=1e-4)
