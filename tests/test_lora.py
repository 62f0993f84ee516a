"""LoRA adapter tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.models import llama, lora
from tts_max_tpu.training.train_step import loss_fn as lm_loss_fn


def _setup():
    cfg = llama.tiny_config(vocab_size=128, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_init_targets_only_projections():
    cfg, params = _setup()
    lp = lora.init_lora(jax.random.PRNGKey(1), params, r=4)
    # embed/norms untouched (None), attn/mlp kernels adapted
    assert lp["embed"]["embedding"] is None
    assert lp["norm"]["scale"] is None
    assert set(lp["layers"]["attn"]["wq"]["kernel"]) == {"a", "b"}
    assert lp["layers"]["attn"]["wq"]["kernel"]["a"].shape == (2, 64, 4)
    assert lp["layers"]["mlp"]["w_down"]["kernel"]["b"].shape == (2, 4, 64)


def test_zero_b_merge_is_identity():
    cfg, params = _setup()
    lp = lora.init_lora(jax.random.PRNGKey(1), params, r=4)
    merged = lora.merge(params, lp, alpha=8, r=4)
    tokens = jnp.zeros((1, 8), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(llama.forward(params, cfg, tokens)),
        np.asarray(llama.forward(merged, cfg, tokens)),
        atol=1e-6,
    )


def test_lora_training_only_updates_adapters():
    cfg, params = _setup()
    lp = lora.init_lora(jax.random.PRNGKey(1), params, r=4)
    batch = {
        "input_ids": jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 128),
        "labels": jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 128),
    }
    fn = lora.lora_loss_fn(params, alpha=8, r=4, loss_fn=lambda p, b: lm_loss_fn(p, cfg, b)[0])
    grads = jax.grad(fn)(lp, batch)
    # gradient reaches adapters ('a' side nonzero after b=0 chain? b grads nonzero)
    gb = np.asarray(grads["layers"]["attn"]["wq"]["kernel"]["b"])
    assert np.abs(gb).max() > 0
    # a few SGD steps reduce the loss
    l0 = fn(lp, batch)
    lp2 = jax.tree_util.tree_map(lambda p, g: p - 1.0 * g, lp, grads)
    l1 = fn(lp2, batch)
    assert float(l1) < float(l0)


def test_adapter_save_load_roundtrip(tmp_path):
    cfg, params = _setup()
    lp = lora.init_lora(jax.random.PRNGKey(4), params, r=2)
    # perturb b so it's not all zeros
    lp = jax.tree_util.tree_map(lambda x: x + 0.5, lp)
    p = str(tmp_path / "adapter.npz")
    lora.save_adapter(p, lp)
    lp2 = lora.load_adapter(p, lp)
    for a, b in zip(jax.tree_util.tree_leaves(lp), jax.tree_util.tree_leaves(lp2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
