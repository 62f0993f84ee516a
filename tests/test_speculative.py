"""Speculative decoding: decode_window parity + exactness vs plain generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.inference.generate import generate
from tts_max_tpu.inference.speculative import speculative_generate
from tts_max_tpu.models import llama
from tts_max_tpu.ops.sampling import SamplingParams


@pytest.fixture(scope="module")
def models():
    # fp32 compute: greedy exactness tests compare decode_window (batched
    # matmuls) against per-token decode_step — bf16 accumulation-order noise
    # (~1 ulp) flips near-ties on a random 64-token model, which is expected
    # in production but would make these tests flaky.
    import dataclasses

    cfg_t = dataclasses.replace(
        llama.tiny_config(vocab_size=64, max_seq_len=256), dtype=jnp.float32
    )
    target = llama.init_params(jax.random.PRNGKey(0), cfg_t)
    draft = llama.init_params(jax.random.PRNGKey(7), cfg_t)
    return cfg_t, target, draft


def _greedy_sp():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0,
                          frequency_penalty=0.0)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_window_matches_step_loop(models, quantized):
    """decode_window over W tokens == W sequential decode_steps (logits and
    cache contents)."""
    cfg, params, _ = models
    b, s, w = 2, 10, 5
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, 60, (b, s)), jnp.int32)
    plens = jnp.asarray([7, 10], jnp.int32)
    window = jnp.asarray(rng.integers(1, 60, (b, w)), jnp.int32)

    cache1 = llama.init_kv_cache(cfg, b, 32, quantized=quantized)
    _, cache1 = llama.prefill(params, cfg, prompt, plens, cache1)
    cache2 = jax.tree.map(lambda x: x, cache1)

    # reference: sequential single-token decode
    step_logits = []
    lengths = plens
    for j in range(w):
        lg, cache1 = llama.decode_step(params, cfg, cache1, window[:, j], lengths)
        step_logits.append(lg)
        lengths = lengths + 1
    ref = jnp.stack(step_logits, axis=1)

    win_logits, cache2 = llama.decode_window(params, cfg, cache2, window, plens)
    np.testing.assert_allclose(
        np.asarray(win_logits), np.asarray(ref), atol=3e-4
    )
    # caches agree on the valid region (compare the whole buffer row range)
    for leaf1, leaf2 in zip(jax.tree.leaves(cache1), jax.tree.leaves(cache2)):
        a1, a2 = np.asarray(leaf1, np.float32), np.asarray(leaf2, np.float32)
        for bi in range(b):
            n = int(plens[bi]) + w
            np.testing.assert_allclose(
                a2[:, bi, :n], a1[:, bi, :n], atol=3e-2 if quantized else 2e-2
            )


def test_greedy_spec_decode_matches_target_greedy(models):
    """With ANY draft, greedy speculative output == target-only greedy."""
    cfg, target, draft = models
    b, s = 2, 8
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(1, 60, (b, s)), jnp.int32)
    plens = jnp.asarray([5, 8], jnp.int32)
    ref = generate(
        target, cfg, prompt, plens, jax.random.PRNGKey(2), sp=_greedy_sp(),
        max_new_tokens=16, eos_id=-1, cache_len=64,
    )
    got = speculative_generate(
        target, cfg, draft, cfg, prompt, plens, jax.random.PRNGKey(3),
        sp=_greedy_sp(), max_new_tokens=16, eos_id=-1, gamma=3, cache_len=64,
    )
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(
        np.asarray(got.num_generated), np.asarray(ref.num_generated)
    )


def test_greedy_spec_decode_with_penalties_matches(models):
    """Repetition/frequency penalties replay exactly through verify."""
    cfg, target, draft = models
    sp = SamplingParams(temperature=0.0, repetition_penalty=1.3,
                        frequency_penalty=0.5, top_k=0)
    b, s = 2, 6
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(1, 60, (b, s)), jnp.int32)
    plens = jnp.asarray([6, 4], jnp.int32)
    ref = generate(
        target, cfg, prompt, plens, jax.random.PRNGKey(2), sp=sp,
        max_new_tokens=12, eos_id=-1, cache_len=64,
    )
    got = speculative_generate(
        target, cfg, draft, cfg, prompt, plens, jax.random.PRNGKey(3),
        sp=sp, max_new_tokens=12, eos_id=-1, gamma=4, cache_len=64,
    )
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_identical_draft_accepts_everything(models):
    """Draft == target in greedy mode: every candidate accepted, so the
    round count collapses to ~tokens/(gamma+1)."""
    cfg, target, _ = models
    b, s, n_new, gamma = 2, 8, 20, 4
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(1, 60, (b, s)), jnp.int32)
    plens = jnp.full((b,), s, jnp.int32)
    got = speculative_generate(
        target, cfg, target, cfg, prompt, plens, jax.random.PRNGKey(4),
        sp=_greedy_sp(), max_new_tokens=n_new, eos_id=-1, gamma=gamma,
        cache_len=64,
    )
    ref = generate(
        target, cfg, prompt, plens, jax.random.PRNGKey(2), sp=_greedy_sp(),
        max_new_tokens=n_new, eos_id=-1, cache_len=64,
    )
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    # 1 seed token + ceil((n_new - 1) / (gamma + 1)) rounds
    assert int(got.steps) == -(-(n_new - 1) // (gamma + 1))


def test_spec_decode_eos_stops(models):
    cfg, target, draft = models
    b, s = 1, 6
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(1, 60, (b, s)), jnp.int32)
    plens = jnp.full((b,), s, jnp.int32)
    ref = generate(
        target, cfg, prompt, plens, jax.random.PRNGKey(2), sp=_greedy_sp(),
        max_new_tokens=12, eos_id=-1, cache_len=64,
    )
    eos = int(np.asarray(ref.tokens)[0, 4])  # 5th greedy token becomes EOS
    got = speculative_generate(
        target, cfg, draft, cfg, prompt, plens, jax.random.PRNGKey(3),
        sp=_greedy_sp(), max_new_tokens=12, eos_id=eos, gamma=3, cache_len=64,
    )
    ref2 = generate(
        target, cfg, prompt, plens, jax.random.PRNGKey(2), sp=_greedy_sp(),
        max_new_tokens=12, eos_id=eos, cache_len=64,
    )
    n = int(np.asarray(ref2.num_generated)[0])
    assert int(np.asarray(got.num_generated)[0]) == n
    np.testing.assert_array_equal(
        np.asarray(got.tokens)[0, :n], np.asarray(ref2.tokens)[0, :n]
    )


def test_sampling_mode_first_token_distribution(models):
    """Stochastic exactness: the distribution of the first speculative token
    after the seed matches the target's sampling distribution (chi-square
    style bound on total variation over many seeds)."""
    cfg, target, draft = models
    sp = SamplingParams(temperature=1.0, top_k=0, top_p=1.0,
                        repetition_penalty=1.0, frequency_penalty=0.0)
    b, s = 1, 6
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(1, 60, (b, s)), jnp.int32)
    plens = jnp.full((b,), s, jnp.int32)

    n_trials = 400
    run = jax.jit(
        lambda key: speculative_generate(
            target, cfg, draft, cfg, prompt, plens, key, sp=sp,
            max_new_tokens=3, eos_id=-1, gamma=2, cache_len=32,
        ).tokens[0, 1]
    )
    keys = jax.random.split(jax.random.PRNGKey(6), n_trials)
    samples = np.asarray(jax.vmap(run)(keys))

    ref_run = jax.jit(
        lambda key: generate(
            target, cfg, prompt, plens, key, sp=sp, max_new_tokens=3,
            eos_id=-1, cache_len=32,
        ).tokens[0, 1]
    )
    ref_samples = np.asarray(jax.vmap(ref_run)(keys))

    v = cfg.vocab_size
    h_got = np.bincount(samples, minlength=v) / n_trials
    h_ref = np.bincount(ref_samples, minlength=v) / n_trials
    tv = 0.5 * np.abs(h_got - h_ref).sum()
    # two empirical distributions from n=400 draws over a ~64-way support:
    # TV between them concentrates well under 0.25
    assert tv < 0.25, tv


def test_spec_decode_vocab_window(models):
    """Full-vocab window == unconstrained (greedy, exact); a narrow window
    keeps every emitted token inside it (sampling mode)."""
    cfg, target, draft = models
    toks = jnp.asarray([[5, 9, 42, 7, 3, 11]], dtype=jnp.int32)
    lens = jnp.asarray([6], jnp.int32)
    sp = _greedy_sp()
    ref = speculative_generate(
        target, cfg, draft, cfg, toks, lens, jax.random.PRNGKey(0),
        sp=sp, max_new_tokens=12, eos_id=-1, gamma=3,
    )
    win = speculative_generate(
        target, cfg, draft, cfg, toks, lens, jax.random.PRNGKey(0),
        sp=sp, max_new_tokens=12, eos_id=-1, gamma=3,
        vocab_window=(0, cfg.vocab_size),
    )
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(win.tokens))

    lo, size = 24, 16
    res = speculative_generate(
        target, cfg, draft, cfg, toks, lens, jax.random.PRNGKey(2),
        sp=SamplingParams(temperature=0.9, top_k=8, repetition_penalty=1.2,
                          frequency_penalty=0.4),
        max_new_tokens=12, eos_id=lo + 5, gamma=3, vocab_window=(lo, size),
    )
    out = np.asarray(res.tokens[0])[: int(res.num_generated[0])]
    assert ((out >= lo) & (out < lo + size)).all(), out

    # and the windowed greedy run must equal windowed plain generate
    wref = generate(
        target, cfg, toks, lens, jax.random.PRNGKey(0), sp=sp,
        max_new_tokens=12, eos_id=-1, vocab_window=(lo, size),
    )
    wspec = speculative_generate(
        target, cfg, target, cfg, toks, lens, jax.random.PRNGKey(0),
        sp=sp, max_new_tokens=12, eos_id=-1, gamma=3,
        vocab_window=(lo, size),
    )
    np.testing.assert_array_equal(np.asarray(wref.tokens),
                                  np.asarray(wspec.tokens))
