"""wav2vec-BERT golden parity tests vs the installed HF torch implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tts_max_tpu.models.codec import w2vbert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_pair():
    """Tiny HF model + imported JAX params."""
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    cfg = w2vbert.tiny_w2vbert_config()
    hf_cfg = Wav2Vec2BertConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        feature_projection_input_dim=cfg.feature_dim,
        position_embeddings_type="relative_key",
        left_max_position_embeddings=cfg.left_max_pos,
        right_max_position_embeddings=cfg.right_max_pos,
        conv_depthwise_kernel_size=cfg.conv_kernel,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        conformer_conv_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = Wav2Vec2BertModel(hf_cfg).eval()
    sd = model.state_dict()
    params = jax.tree_util.tree_map(
        jnp.asarray, w2vbert.import_hf_state_dict(sd, cfg)
    )
    return cfg, model, params


def test_layerwise_parity(hf_pair):
    cfg, model, params = hf_pair
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 12, cfg.feature_dim)).astype(np.float32)
    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(feats), output_hidden_states=True
        )
    for n_layers in (0, 1, 2, 3):
        ref = out.hidden_states[n_layers].numpy()
        ours = np.asarray(
            w2vbert.encode(params, jnp.asarray(feats), cfg, num_layers=n_layers)
        )
        np.testing.assert_allclose(
            ours, ref, atol=2e-4, err_msg=f"layer {n_layers}"
        )


def test_default_num_layers(hf_pair):
    cfg, model, params = hf_pair
    feats = jnp.zeros((1, 6, cfg.feature_dim))
    # default runs num_layers_to_run (=2 in the tiny config)
    ours = w2vbert.encode(params, feats, cfg)
    ref = w2vbert.encode(params, feats, cfg, num_layers=cfg.num_layers_to_run)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref))


def test_feature_extractor_matches_hf():
    from transformers import SeamlessM4TFeatureExtractor

    rng = np.random.default_rng(1)
    wav = rng.standard_normal((1, 3200)).astype(np.float32) * 0.1
    ours = w2vbert.extract_features(wav)
    fe = SeamlessM4TFeatureExtractor()
    ref = fe([wav[0]], sampling_rate=16000, return_tensors="np")["input_features"]
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert ours.shape[-1] == 160
