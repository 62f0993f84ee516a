"""HF Llama import golden-parity tests vs the installed transformers torch impl."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tts_max_tpu.models import hf_import, llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("hf_llama")
    model.save_pretrained(str(d))
    return str(d), model


def test_import_logits_parity(hf_model_dir):
    d, hf_model = hf_model_dir
    params, cfg = hf_import.load_model_from_hf_dir(d)
    assert cfg.dim == 64 and cfg.n_layers == 2 and not cfg.tie_embeddings
    ids = np.array([[1, 5, 9, 200, 3, 17]], dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(input_ids=torch.from_numpy(ids)).logits.numpy()
    cfg = llama.replace(cfg, dtype=jnp.float32)
    ours = np.asarray(
        llama.forward(jax.tree_util.tree_map(jnp.asarray, params), cfg, jnp.asarray(ids))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_export_roundtrip(hf_model_dir, tmp_path):
    d, _ = hf_model_dir
    params, cfg = hf_import.load_model_from_hf_dir(d)
    out = str(tmp_path / "export")
    hf_import.save_model_to_hf_dir(params, cfg, out, eos_token_id=42)
    params2, cfg2 = hf_import.load_model_from_hf_dir(out)
    assert cfg2.dim == cfg.dim
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    import json, os

    with open(os.path.join(out, "config.json")) as f:
        assert json.load(f)["eos_token_id"] == 42


def test_resize_embeddings(hf_model_dir):
    d, _ = hf_model_dir
    params, cfg = hf_import.load_model_from_hf_dir(d, vocab_size=300)
    assert cfg.vocab_size == 300
    assert params["embed"]["embedding"].shape == (300, 64)
    assert params["lm_head"]["kernel"].shape == (64, 300)
    # new rows centered on the old mean
    emb = np.asarray(params["embed"]["embedding"])
    np.testing.assert_allclose(
        emb[256:].mean(axis=0), emb[:256].mean(axis=0), atol=0.02
    )
    # still runs
    cfg = llama.replace(cfg, dtype=jnp.float32)
    logits = llama.forward(
        jax.tree_util.tree_map(jnp.asarray, params), cfg, jnp.zeros((1, 4), jnp.int32)
    )
    assert logits.shape == (1, 4, 300)


def test_training_loss_matches_torch(hf_model_dir):
    """Cross-entropy on the same batch must match HF torch's causal-LM loss."""
    d, hf_model = hf_model_dir
    from tts_max_tpu.training.train_step import loss_fn

    params, cfg = hf_import.load_model_from_hf_dir(d)
    cfg = llama.replace(cfg, dtype=jnp.float32)
    ids = np.array([[3, 7, 1, 99, 45, 200, 8, 12]], dtype=np.int64)
    labels = ids.copy()
    labels[:, :3] = -100
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(ids), labels=torch.from_numpy(labels)
        ).loss.item()
    ours, toks = loss_fn(
        jax.tree_util.tree_map(jnp.asarray, params), cfg,
        {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)},
    )
    assert int(toks) == 5
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_quantized_serving_dir_roundtrip(tmp_path):
    """convert_checkpoint --quantize writes a pre-quantized dir that
    load_serving_model restores exactly (payload + scales), int8 and packed
    int4 alike."""
    from tts_max_tpu.models import quantization as q

    cfg = llama.tiny_config(vocab_size=256, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    for mode, bits in (("int8", 8), ("int4", 4)):
        qp = q.quantize_llama_params(params, bits=bits)
        d = str(tmp_path / f"q{bits}")
        hf_import.save_quantized_dir(jax.device_get(qp), cfg, d, bits)
        assert hf_import.is_quantized_dir(d)
        loaded, lcfg = hf_import.load_serving_model(d)
        assert lcfg == cfg
        for a, b in zip(jax.tree_util.tree_leaves(qp),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # loaded params drive a forward pass
        toks = jnp.zeros((1, 8), jnp.int32)
        out = llama.forward(loaded, lcfg, toks)
        assert np.isfinite(np.asarray(out)).all()


def test_save_load_roundtrip_bit_exact(tmp_path):
    """save_model_to_hf_dir -> load_model_from_hf_dir must be the identity
    on every leaf AND on logits. Round-5 regression: export_llama returns
    F-contiguous transposed views, and safetensors' numpy writer silently
    serialized their BASE buffer's byte order — every serving export's
    layer kernels came back transposed (caught when a converted trained
    checkpoint produced random-level logits)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tts_max_tpu.models import hf_import, llama

    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=128, max_seq_len=64),
        use_llama3_rope_scaling=True,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    d = str(tmp_path / "serving")
    hf_import.save_model_to_hf_dir(params, cfg, d)
    p2, cfg2 = hf_import.load_model_from_hf_dir(d)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert len(flat1) == len(flat2)
    for (path, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=jax.tree_util.keystr(path),
        )
    toks = jnp.asarray(
        np.random.default_rng(0).integers(3, 128, (2, 32)), jnp.int32
    )
    np.testing.assert_allclose(
        np.asarray(llama.forward(params, cfg, toks)),
        np.asarray(llama.forward(p2, cfg2, toks)),
        atol=1e-5,
    )
