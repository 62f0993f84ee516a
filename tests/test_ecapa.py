"""ECAPA-TDNN golden parity vs the reference torch blocks."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.training.rlhf import ecapa

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mod():
    """Load the reference ecapa_tdnn module (blocks only; the full model
    needs s3prl which isn't installed)."""
    spec = importlib.util.spec_from_file_location(
        "ref_ecapa", "/root/reference/tts/training/rlhf/ecapa_tdnn.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_se_res2_block_parity(ref_mod):
    torch.manual_seed(0)
    C, scale = 32, 4
    block = ref_mod.SE_Res2Block(
        C, C, kernel_size=3, stride=1, padding=2, dilation=2, scale=scale,
        se_bottleneck_dim=8,
    ).eval()
    # randomize batchnorm running stats to make the test meaningful
    for m in block.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    cfg = ecapa.tiny_ecapa_config()
    cfg = ecapa.ECAPAConfig(feat_dim=16, channels=C, emb_dim=8, scale=scale,
                            se_bottleneck_dim=8, attention_channels=8,
                            cat_channels=3 * C)
    x = torch.randn(2, C, 20)
    with torch.no_grad():
        ref = block(x).numpy().transpose(0, 2, 1)

    sd = block.state_dict()
    p = {
        "conv1": _conv_bn_from(sd, "Conv1dReluBn1"),
        "res2": _res2_from(sd, "Res2Conv1dReluBn", scale),
        "conv2": _conv_bn_from(sd, "Conv1dReluBn2"),
        "se": {
            "linear1": {"kernel": sd["SE_Connect.linear1.weight"].numpy().T,
                        "bias": sd["SE_Connect.linear1.bias"].numpy()},
            "linear2": {"kernel": sd["SE_Connect.linear2.weight"].numpy().T,
                        "bias": sd["SE_Connect.linear2.bias"].numpy()},
        },
    }
    ours = np.asarray(
        ecapa._se_res2_block(
            jnp.asarray(x.numpy().transpose(0, 2, 1)),
            jax.tree_util.tree_map(jnp.asarray, p), cfg, padding=2, dilation=2,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def _conv_bn_from(sd, base):
    return {
        "conv": {"kernel": np.transpose(sd[f"{base}.conv.weight"].numpy(), (2, 1, 0)),
                 "bias": sd[f"{base}.conv.bias"].numpy()},
        "bn": {"scale": sd[f"{base}.bn.weight"].numpy(),
               "bias": sd[f"{base}.bn.bias"].numpy(),
               "mean": sd[f"{base}.bn.running_mean"].numpy(),
               "var": sd[f"{base}.bn.running_var"].numpy()},
    }


def _res2_from(sd, base, scale):
    convs = []
    for i in range(scale - 1):
        convs.append({
            "conv": {"kernel": np.transpose(sd[f"{base}.convs.{i}.weight"].numpy(), (2, 1, 0)),
                     "bias": sd[f"{base}.convs.{i}.bias"].numpy()},
            "bn": {"scale": sd[f"{base}.bns.{i}.weight"].numpy(),
                   "bias": sd[f"{base}.bns.{i}.bias"].numpy(),
                   "mean": sd[f"{base}.bns.{i}.running_mean"].numpy(),
                   "var": sd[f"{base}.bns.{i}.running_var"].numpy()},
        })
    return {"convs": convs}


def test_attentive_stats_pool_parity(ref_mod):
    torch.manual_seed(1)
    pool = ref_mod.AttentiveStatsPool(24, attention_channels=8).eval()
    x = torch.randn(2, 24, 15)
    with torch.no_grad():
        ref = pool(x).numpy()
    sd = pool.state_dict()
    p = {
        "linear1": {"kernel": np.transpose(sd["linear1.weight"].numpy(), (2, 1, 0)),
                    "bias": sd["linear1.bias"].numpy()},
        "linear2": {"kernel": np.transpose(sd["linear2.weight"].numpy(), (2, 1, 0)),
                    "bias": sd["linear2.bias"].numpy()},
    }
    ours = np.asarray(
        ecapa._attentive_stats_pool(
            jnp.asarray(x.numpy().transpose(0, 2, 1)),
            jax.tree_util.tree_map(jnp.asarray, p),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_full_embed_runs():
    cfg = ecapa.tiny_ecapa_config()
    params = ecapa.init_params(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 30, cfg.feat_dim))
    emb = ecapa.embed_features(params, feats, cfg)
    assert emb.shape == (2, cfg.emb_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_embed_fn_discriminates_speakers():
    """Same signal -> cosine ~1; different spectra -> lower."""
    embed = ecapa.make_embed_fn(cfg=ecapa.tiny_ecapa_config())
    t = np.arange(16000) / 16000
    a = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    b = (np.sign(np.sin(2 * np.pi * 700 * t)) * 0.5).astype(np.float32)

    def cos(x, y):
        return float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))

    ea, ea2, eb = embed(a), embed(a[:12000]), embed(b)
    assert cos(ea, ea2) > cos(ea, eb)
