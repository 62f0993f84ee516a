"""WavLM golden parity tests vs the installed HF torch implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tts_max_tpu.models import wavlm

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_config(cfg: wavlm.WavLMConfig):
    from transformers import WavLMConfig as HFWavLMConfig

    return HFWavLMConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.ffn_dim,
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernels),
        conv_stride=list(cfg.conv_strides),
        num_buckets=cfg.num_buckets,
        max_bucket_distance=cfg.max_distance,
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import WavLMModel

    cfg = wavlm.tiny_wavlm_config()
    torch.manual_seed(0)
    model = WavLMModel(_hf_config(cfg)).eval()
    params = wavlm.import_hf_state_dict(model.state_dict(), cfg)
    return cfg, model, params


def _wav(batch=2, n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, n)) * 0.1).astype(np.float32)


def test_feature_encoder_parity(hf_pair):
    cfg, model, params = hf_pair
    wav = _wav()
    with torch.no_grad():
        ref = model.feature_extractor(torch.from_numpy(wav)).numpy()  # [B,C,T]
    ours = np.asarray(wavlm.feature_encoder(params, cfg, jnp.asarray(wav)))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-5)


def test_position_bias_parity(hf_pair):
    cfg, model, params = hf_pair
    t = 13
    attn0 = model.encoder.layers[0].attention
    with torch.no_grad():
        ref = attn0.compute_bias(t, t).numpy()  # [H, T, T]
    ours = np.asarray(wavlm.compute_position_bias(params, cfg, t))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_hidden_state_stack_parity(hf_pair):
    cfg, model, params = hf_pair
    wav = _wav(batch=2, n=1800)
    with torch.no_grad():
        out = model(torch.from_numpy(wav), output_hidden_states=True)
    ref_stack = np.stack([h.numpy() for h in out.hidden_states])
    ours = np.asarray(wavlm.encode(params, cfg, jnp.asarray(wav)))
    assert ours.shape == ref_stack.shape  # [L+1, B, T, D]
    np.testing.assert_allclose(ours, ref_stack, atol=5e-4)
    # last entry == last_hidden_state
    np.testing.assert_allclose(
        ours[-1], out.last_hidden_state.numpy(), atol=5e-4
    )


def test_frame_count_matches_hf(hf_pair):
    cfg, model, params = hf_pair
    for n in (400, 1111, 3200):
        ref = int(
            model._get_feat_extract_output_lengths(torch.tensor(n))
        )
        assert wavlm.frame_count(cfg, n) == ref


def test_length_masking_isolates_padding(hf_pair):
    """A padded batch entry must produce the same frames as the unpadded
    clip within its valid region."""
    cfg, model, params = hf_pair
    wav = _wav(batch=1, n=1600, seed=3)
    padded = np.concatenate([wav, np.zeros((1, 800), np.float32)], axis=1)
    solo = np.asarray(wavlm.encode(params, cfg, jnp.asarray(wav)))
    both = np.asarray(
        wavlm.encode(
            params, cfg, jnp.asarray(padded),
            lengths=jnp.asarray([1600], jnp.int32),
        )
    )
    t = solo.shape[2]
    np.testing.assert_allclose(both[:, :, :t], solo, atol=5e-4)


def test_init_params_shapes_roundtrip():
    cfg = wavlm.tiny_wavlm_config()
    params = wavlm.init_params(jax.random.PRNGKey(0), cfg)
    wav = jnp.zeros((1, 1600))
    stack = wavlm.encode(params, cfg, wav)
    t = wavlm.frame_count(cfg, 1600)
    assert stack.shape == (cfg.num_layers + 1, 1, t, cfg.hidden_size)


def test_wavlm_embed_fn_similarity_reward_path(hf_pair):
    """make_wavlm_embed_fn plugs into reward_utils.eval_similarity."""
    cfg, _, params = hf_pair
    from tts_max_tpu.training.rlhf import reward_utils
    from tts_max_tpu.training.rlhf.ecapa import (
        ECAPAConfig, make_wavlm_embed_fn, tiny_ecapa_config,
    )

    ecfg = ECAPAConfig(feat_dim=cfg.hidden_size, channels=32, emb_dim=8,
                       scale=4, se_bottleneck_dim=8, attention_channels=8,
                       cat_channels=96)
    fn = make_wavlm_embed_fn(params, cfg, ecapa_cfg=ecfg)
    rng = np.random.default_rng(5)
    a = (rng.standard_normal(3200) * 0.1).astype(np.float32)
    b = (rng.standard_normal(3200) * 0.1).astype(np.float32)
    sim_ab = reward_utils.eval_similarity(fn, a, b)
    sim_aa = reward_utils.eval_similarity(fn, a, a)
    assert -1.0 <= sim_ab <= 1.0
    assert sim_aa == pytest.approx(1.0, abs=1e-4)


def test_wavlm_weighted_features_match_manual(hf_pair):
    """The softmax layer weighting matches a manual computation."""
    cfg, model, params = hf_pair
    import torch as _torch

    wav = _wav(batch=1, n=1600, seed=7)
    fw = np.linspace(-1, 1, cfg.num_layers + 1).astype(np.float32)
    with _torch.no_grad():
        hs = model(_torch.from_numpy(wav), output_hidden_states=True).hidden_states
    ref = np.einsum(
        "l,lbtd->btd",
        np.exp(fw) / np.exp(fw).sum(),
        np.stack([h.numpy() for h in hs]),
    )
    stack = wavlm.encode(params, cfg, jnp.asarray(wav))
    ours = np.einsum("l,lbtd->btd", np.asarray(jax.nn.softmax(jnp.asarray(fw))),
                     np.asarray(stack))
    np.testing.assert_allclose(ours, ref, atol=5e-4)
