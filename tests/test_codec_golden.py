"""Full-graph codec golden gate (VERDICT r2 item 4).

tests/fixtures/codec_golden.npz holds the reference codec graphs — FULL
encoder (wav -> FSQ codes) and decoder (codes -> wav) — built in plain torch
(NCW, weight-normed convs, SDPA, irfft+fold ISTFT; see
fixtures/generate_codec_golden.py) with random weights at tiny shapes. Our
JAX graphs (NWC, XLA convs, own kaiser/ISTFT/FSQ) must reproduce the outputs
after torch_import. This closes the gap between the block-level parity tests
and the env-gated real-weight gates (XCODEC2_CHECKPOINT): a fusion / FSQ /
ISTFT ordering bug in the end-to-end wiring fails here, on every CI run.

Reference graphs: encoder.py:63-83, decoder.py:69-89,
decoder_modules.py:403-464.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.models.codec import encoder as enc
from tts_max_tpu.models.codec import fsq, torch_import, vocos

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "codec_golden.npz")


@pytest.fixture(scope="module")
def golden():
    data = dict(np.load(FIXTURE))
    sd = {k: v for k, v in data.items() if not k.startswith("__")}
    return data, sd


@pytest.fixture(scope="module")
def enc_cfg():
    return enc.EncoderConfig(
        num_generator_features=4,
        up_ratios=(2, 2, 4, 4, 5),
        acoustic_dim=32,
        semantic_input_dim=8,
        semantic_dim=32,
        fsq=fsq.FSQConfig(dim=64),
    )


@pytest.fixture(scope="module")
def dec_cfg():
    return vocos.VocosConfig(
        hidden_dim=32, depth=2, heads=2, rope_dim=16, hop_length=320,
        vq_dim=64, fsq=fsq.FSQConfig(dim=64), resnet_groups=4, dropout=0.0,
    )


def test_full_encoder_graph_matches_golden(golden, enc_cfg):
    data, sd = golden
    params = jax.tree_util.tree_map(
        jnp.asarray, torch_import.import_encoder(sd)
    )
    wav = jnp.asarray(data["__wav"])
    feats = jnp.asarray(data["__feats"])

    ac = enc.acoustic_encoder(wav, params["acoustic"], enc_cfg)
    np.testing.assert_allclose(
        np.asarray(ac), data["__enc_acoustic"], atol=2e-4, rtol=2e-4,
        err_msg="acoustic conv stack diverged",
    )
    se = enc.semantic_encoder(feats, params["semantic"], enc_cfg)
    np.testing.assert_allclose(
        np.asarray(se), data["__enc_semantic"], atol=2e-4, rtol=2e-4,
        err_msg="semantic encoder diverged",
    )
    t = min(ac.shape[1], se.shape[1])
    fused = vocos.linear(
        jnp.concatenate([se[:, :t], ac[:, :t]], axis=-1), params["fusion"]
    )
    np.testing.assert_allclose(
        np.asarray(fused), data["__enc_fused"], atol=2e-4, rtol=2e-4,
        err_msg="fusion linear diverged",
    )
    codes = enc.encode_features(params, wav, feats, enc_cfg)
    # integer codes must match EXACTLY (generator asserts a rounding margin
    # far above fp32 conv noise)
    np.testing.assert_array_equal(np.asarray(codes), data["__enc_codes"])


def test_full_decoder_graph_matches_golden(golden, dec_cfg):
    data, sd = golden
    params = jax.tree_util.tree_map(
        jnp.asarray, torch_import.import_decoder(sd, depth=2)
    )
    codes = jnp.asarray(data["__dec_codes"])

    emb = fsq.decode_indices(params["quantizer"], codes, dec_cfg.fsq)
    np.testing.assert_allclose(
        np.asarray(emb), data["__dec_emb"], atol=1e-5, rtol=1e-5,
        err_msg="FSQ index->embedding lookup diverged",
    )
    h = vocos.linear(emb, params["fc_post_a"])
    bb = vocos.backbone(h, params["backbone"], dec_cfg)
    np.testing.assert_allclose(
        np.asarray(bb), data["__dec_backbone"], atol=5e-4, rtol=5e-4,
        err_msg="Vocos backbone diverged",
    )
    wav = vocos.decode(params, codes, dec_cfg)
    ref = data["__dec_wav"]
    assert wav.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(wav), ref, atol=5e-4, rtol=1e-3,
        err_msg="full decoder waveform diverged",
    )
    # scale sanity: relative L2 under 0.1% of signal power
    rel = np.linalg.norm(np.asarray(wav) - ref) / np.linalg.norm(ref)
    assert rel < 1e-3, rel
