"""Draft distillation (training/distill.py) — the speculative-decode recipe."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tts_max_tpu.models import llama
from tts_max_tpu.training import distill


def _setup():
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=128, max_seq_len=64), n_layers=4
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_truncated_draft_shapes():
    cfg, params = _setup()
    draft, draft_cfg = distill.truncated_draft(params, cfg, 2)
    assert draft_cfg.n_layers == 2
    assert jax.tree.leaves(draft["layers"])[0].shape[0] == 2
    # shared embed/head untouched
    np.testing.assert_array_equal(
        np.asarray(draft["embed"]["embedding"]),
        np.asarray(params["embed"]["embedding"]),
    )


def test_distill_loss_chunked_matches_naive():
    """Blockwise KL == a dense reference computation."""
    cfg, params = _setup()
    draft, draft_cfg = distill.truncated_draft(params, cfg, 2)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 33), 0, 128)
    mask = jnp.arange(33)[None, :] < jnp.asarray([[20], [33]])
    out = distill.distill_loss(
        draft, params, toks, mask, draft_cfg=draft_cfg, target_cfg=cfg,
        chunk_size=8,
    )
    tl = jax.nn.log_softmax(llama.forward(params, cfg, toks)[:, :-1], -1)
    dl = jax.nn.log_softmax(
        llama.forward(draft, draft_cfg, toks)[:, :-1], -1
    )
    kl = jnp.sum(jnp.exp(tl) * (tl - dl), -1)
    m = mask[:, 1:]
    ref = jnp.where(m, kl, 0).sum() / m.sum()
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4)


def test_distillation_improves_kl_and_acceptance():
    """A few hundred steps of distillation must cut the KL and raise the
    draft's realized tokens/round under greedy speculative decoding."""
    from tts_max_tpu.inference.speculative import speculative_generate
    from tts_max_tpu.ops.sampling import SamplingParams

    cfg, params = _setup()
    draft0, draft_cfg = distill.truncated_draft(params, cfg, 1)
    tx = optax.adamw(3e-3)
    opt_state = tx.init(draft0)
    step = distill.make_distill_step(draft_cfg, cfg, tx, chunk_size=32)
    rng = np.random.default_rng(0)
    draft = jax.tree.map(jnp.copy, draft0)
    losses = []
    for i in range(300):
        toks = jnp.asarray(rng.integers(0, 128, (4, 48)).astype(np.int32))
        mask = jnp.ones((4, 48), bool)
        draft, opt_state, loss, _ = step(draft, params, opt_state, toks, mask)
        losses.append(float(loss))
    # a random tiny target is near-uniform, so the truncated draft starts
    # close already — assert a solid relative improvement, not a cliff
    assert losses[-1] < 0.75 * losses[0], (losses[0], losses[-1])

    sp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                        frequency_penalty=0.0)
    prompts = jnp.asarray(rng.integers(3, 128, (4, 8)).astype(np.int32))
    lens = jnp.full((4,), 8, jnp.int32)

    def rounds(dp):
        res = speculative_generate(
            params, cfg, dp, draft_cfg, prompts, lens,
            jax.random.PRNGKey(2), sp=sp, max_new_tokens=24, eos_id=-1,
            gamma=3,
        )
        return int(res.steps)

    # fewer verify rounds for the same 24 tokens = more accepted per round
    assert rounds(draft) <= rounds(draft0)
