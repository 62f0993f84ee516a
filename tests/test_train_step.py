"""Training step tests: loss math, accumulation, clipping, sharded execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.models import llama
from tts_max_tpu.training import optim, train_step as ts


@pytest.fixture(scope="module")
def setup():
    cfg = llama.tiny_config(vocab_size=128, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.create_optimizer(1e-3)
    opt_state = tx.init(params)
    return cfg, params, tx, opt_state


def _batch(cfg, accum=1, b=4, L=16, seed=0):
    k = jax.random.PRNGKey(seed)
    ids = jax.random.randint(k, (accum, b, L), 0, cfg.vocab_size)
    labels = ids.at[:, :, :4].set(-100)  # mask a prompt region
    return {"input_ids": ids, "labels": labels}


def test_causal_lm_loss_masking():
    logits = jnp.zeros((1, 4, 8))  # uniform -> loss = log(8)
    labels = jnp.array([[-100, 2, -100, 5]])
    loss, toks = ts.causal_lm_loss(logits, labels)
    # shifted: targets = labels[1:] = [2, -100, 5] -> 2 valid tokens
    assert int(toks) == 2
    np.testing.assert_allclose(float(loss), np.log(8), atol=1e-5)


def test_all_masked_loss_is_zero():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.full((1, 4), -100)
    loss, toks = ts.causal_lm_loss(logits, labels)
    assert int(toks) == 0 and float(loss) == 0.0


def test_train_step_reduces_loss(setup):
    cfg, params, tx, opt_state = setup
    batch = _batch(cfg)
    p, o = params, opt_state
    losses = []
    for _ in range(8):
        p, o, m = ts.train_step(p, o, batch, cfg=cfg, tx=tx)
        losses.append(float(m.loss))
        assert float(m.nonfinite) == 0.0
    assert losses[-1] < losses[0] * 0.9  # same batch -> loss must drop


def test_gradient_accumulation_equivalence(setup):
    """A=2 accumulation over [b1; b2] must give the same update direction as
    A=1 over the concatenated batch (identical per-micro-batch token counts)."""
    cfg, params, _, _ = setup
    import optax

    # SGD so the param delta is proportional to the averaged gradient
    # (adam's first step is ~sign(g), amplifying fp noise on tiny grads)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)
    big = _batch(cfg, accum=1, b=8, L=16, seed=3)
    split = {
        "input_ids": big["input_ids"].reshape(2, 4, 16),
        "labels": big["labels"].reshape(2, 4, 16),
    }
    p1, _, m1 = ts.train_step(params, opt_state, big, cfg=cfg, tx=tx)
    p2, _, m2 = ts.train_step(params, opt_state, split, cfg=cfg, tx=tx)
    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    d1 = jax.tree_util.tree_leaves(p1)[0] - jax.tree_util.tree_leaves(params)[0]
    d2 = jax.tree_util.tree_leaves(p2)[0] - jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-6)


def test_nonfinite_guard(setup):
    cfg, params, tx, opt_state = setup
    bad = jax.tree_util.tree_map(lambda p: p, params)
    bad["norm"]["scale"] = bad["norm"]["scale"] * jnp.nan
    batch = _batch(cfg)
    p, o, m = ts.train_step(bad, opt_state, batch, cfg=cfg, tx=tx)
    assert float(m.nonfinite) == 1.0
    # params unchanged (update skipped)
    np.testing.assert_array_equal(
        np.asarray(p["embed"]["embedding"]), np.asarray(bad["embed"]["embedding"])
    )


def test_cosine_schedule_reference_parity():
    # exact values from the reference formula (optimization.py:37-52)
    sched = optim.cosine_warmup_schedule(1e-3, warmup_steps=10, lr_decay_steps=110)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    # midpoint of cosine: (start+peak)/2 = 5.5e-4
    np.testing.assert_allclose(float(sched(60)), 5.5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(110)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(500)), 1e-4, rtol=1e-5)
    with pytest.raises(ValueError):
        optim.cosine_warmup_schedule(1e-3, 10, 10)


def test_sharded_train_step(mesh8):
    """The same step compiled with NamedShardings on the 2x2x2 mesh must run
    and match the unsharded numerics."""
    cfg = llama.tiny_config(vocab_size=128, max_seq_len=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.create_optimizer(1e-3)
    opt_state = tx.init(params)
    batch = _batch(cfg, accum=2, b=4, L=16, seed=1)

    _, _, m_ref = ts.train_step(params, opt_state, batch, cfg=cfg, tx=tx)

    step = ts.make_train_step(mesh8, cfg, tx, params)
    p2 = jax.device_put(params, ts.params_shardings(params, mesh8))
    o2 = jax.device_put(opt_state, ts._opt_state_shardings(tx, params,
                                                           ts.params_shardings(params, mesh8), mesh8))
    b2 = jax.device_put(batch, {k: ts.data_sh_axis1(mesh8) for k in batch})
    p_new, o_new, m = step(p2, o2, b2)
    np.testing.assert_allclose(float(m.loss), float(m_ref.loss), rtol=1e-4)
    assert float(m.nonfinite) == 0.0


def test_remat_policies_match_no_remat():
    """remat (full and dots policy) changes memory, not math: same loss and
    same updated params as the no-remat step."""
    import dataclasses

    from tts_max_tpu.training import optim

    base = dataclasses.replace(
        llama.tiny_config(vocab_size=128, max_seq_len=64), dtype=jnp.float32
    )
    params = llama.init_params(jax.random.PRNGKey(0), base)
    tx = optim.create_optimizer(1e-3)
    batch = {
        "input_ids": jax.random.randint(jax.random.PRNGKey(1), (1, 4, 32), 0, 128),
        "labels": jax.random.randint(jax.random.PRNGKey(2), (1, 4, 32), 0, 128),
    }
    outs = {}
    for name, cfg in (
        ("none", base),
        ("full", dataclasses.replace(base, remat=True)),
        ("dots", dataclasses.replace(base, remat=True, remat_policy="dots")),
    ):
        opt_state = tx.init(params)
        new_p, _, m = ts.train_step(
            params, opt_state, batch, cfg=cfg, tx=tx
        )
        outs[name] = (float(m.loss), new_p)
    for name in ("full", "dots"):
        assert abs(outs[name][0] - outs["none"][0]) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(outs[name][1]),
                        jax.tree_util.tree_leaves(outs["none"][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6)  # fp32 recompute reassoc


def test_bf16_adam_mu_dtype():
    from tts_max_tpu.training import optim

    cfg = llama.tiny_config(vocab_size=64, max_seq_len=32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tx = optim.create_optimizer(1e-3, mu_dtype="bf16")
    st = tx.init(params)
    mus = [l.dtype for l in jax.tree_util.tree_leaves(st)
           if hasattr(l, "dtype") and l.ndim > 0]
    assert jnp.bfloat16 in mus
    batch = {
        "input_ids": jnp.zeros((1, 2, 16), jnp.int32),
        "labels": jnp.zeros((1, 2, 16), jnp.int32),
    }
    new_p, _, m = ts.train_step(params, st, batch, cfg=cfg, tx=tx)
    assert np.isfinite(float(m.loss))


def test_chunked_loss_matches_full():
    """chunked_causal_lm_loss == causal_lm_loss in value AND gradient
    (VERDICT r1 item 4), incl. a chunk size that doesn't divide T."""
    cfg = llama.tiny_config(vocab_size=96, max_seq_len=40)
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(0, 96, (2, 40)).astype(np.int32),
        "labels": rng.integers(0, 96, (2, 40)).astype(np.int32),
    }
    batch["labels"][:, :5] = -100

    for chunk in (8, 13, 64):  # divides, doesn't divide, > T
        (l_full, n_full), g_full = jax.value_and_grad(
            ts.loss_fn, has_aux=True)(params, cfg, batch, 0)
        (l_chunk, n_chunk), g_chunk = jax.value_and_grad(
            ts.loss_fn, has_aux=True)(params, cfg, batch, chunk)
        assert int(n_full) == int(n_chunk)
        np.testing.assert_allclose(float(l_full), float(l_chunk), rtol=1e-6)
        # grads: chunked dW accumulates per-chunk fp32 partial sums of bf16
        # products in a different reduction order than the single big matmul
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_chunk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3)


def test_chunked_loss_in_sharded_step(mesh8):
    """Chunked loss works under the full GSPMD train step."""
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    from tts_max_tpu.training import optim

    tx = optim.create_optimizer(1e-3)
    with mesh8:
        step = ts.make_train_step(mesh8, cfg, tx, params, loss_chunk_size=16)
        step_full = ts.make_train_step(mesh8, cfg, tx, params)
        opt_state = jax.jit(tx.init)(params)
        batch = {
            "input_ids": jnp.zeros((1, 8, 32), jnp.int32),
            "labels": jnp.ones((1, 8, 32), jnp.int32),
        }
        opt2 = jax.jit(tx.init)(params)
        p1, _, m1 = step(jax.tree_util.tree_map(jnp.copy, params), opt_state,
                         batch)
        p2, _, m2 = step_full(jax.tree_util.tree_map(jnp.copy, params), opt2,
                              batch)
        np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-6)
