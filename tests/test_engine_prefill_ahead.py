"""Prefill-ahead (parked) admissions — the round-5 TTFT feature.

When the slot pool is saturated, the engine prefills queued requests into a
separate park buffer and emits their first token immediately (preview-
sampled with exactly the inputs the decode's first step will see); the KV
attaches to a slot with a row-sized copy when one frees. Output tokens must
be IDENTICAL to the non-parked engine: per-request seeded sampling depends
only on (seed, logits, counts), and in fp32 both paths compute the same
logits (positions beyond the prompt differ — zeros vs park garbage — but
are masked out of the softmax exactly).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.inference.engine import InferenceEngine, PagedInferenceEngine
from tts_max_tpu.models import llama
from tts_max_tpu.ops.sampling import SamplingParams


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=64, max_seq_len=512), dtype=jnp.float32
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _greedy_sp():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0,
                          frequency_penalty=0.0)


def _sampled_sp():
    return SamplingParams(temperature=0.9, top_k=8, repetition_penalty=1.1,
                          frequency_penalty=0.1)


def _load(rng, n, budget_one_at=()):
    prompts = [rng.integers(3, 60, rng.choice([4, 9, 33])).astype(np.int32)
               for _ in range(n)]
    budgets = [int(rng.integers(5, 60)) for _ in range(n)]
    for i in budget_one_at:
        budgets[i] = 1  # completes at park (preview token is the output)
    return prompts, budgets


def _run(engine, prompts, budgets):
    ids = [engine.submit(p, b, eos_id=-1, sampling_seed=100 + i)
           for i, (p, b) in enumerate(zip(prompts, budgets))]
    by_id = {c.request_id: c for c in engine.run()}
    return ids, [by_id[i].tokens for i in ids]


@pytest.mark.parametrize("sp_name", ["greedy", "sampled"])
def test_contiguous_parked_matches_plain(setup, sp_name):
    """Saturated load (2 slots, 12 requests): parked admissions must emit
    the identical token streams — including SAMPLED rollouts, which also
    exercises the park-preview == decode-re-derivation assert in
    _process_decode_blob on every attached request."""
    cfg, params = setup
    sp = _greedy_sp() if sp_name == "greedy" else _sampled_sp()
    rng = np.random.default_rng(5)
    prompts, budgets = _load(rng, 12, budget_one_at=(7,))
    kw = dict(max_batch=2, max_len=128, sp=sp, steps_per_dispatch=4,
              min_stage=32)
    ref = InferenceEngine(params, cfg, prefill_ahead=False, **kw)
    _, ref_out = _run(ref, prompts, budgets)
    eng = InferenceEngine(params, cfg, prefill_ahead=True, park_rows=4,
                          **kw)
    ids, out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)
    assert eng.stats()["parked_total"] > 0
    # every request got a first-token timestamp (TTFT observability)
    assert set(ids) <= set(eng.first_token_times)
    # park rows were all recycled
    assert len(eng._free_park_rows) == 4


def test_paged_parked_matches_plain(setup):
    """Paged engine (fresh-block attach + persistent read cache): parked
    admissions bit-exact vs plain, with prefix caching enabled (suffix
    candidates take the queued path; attach registers its blocks)."""
    cfg, params = setup
    rng = np.random.default_rng(11)
    prompts, budgets = _load(rng, 10)
    shared = rng.integers(3, 60, 40).astype(np.int32)
    for i in (4, 5, 6):
        prompts[i] = np.concatenate([shared, prompts[i]])
    kw = dict(max_batch=2, max_len=128, block_size=32, sp=_greedy_sp(),
              steps_per_dispatch=4, min_stage=32, enable_prefix_cache=True)
    ref = PagedInferenceEngine(params, cfg, prefill_ahead=False, **kw)
    _, ref_out = _run(ref, prompts, budgets)
    eng = PagedInferenceEngine(params, cfg, prefill_ahead=True, park_rows=4,
                               **kw)
    _, out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)
    assert eng.stats()["parked_total"] > 0
    # block accounting balanced after the run
    assert len(eng._free_blocks) + len(eng._evictable) == eng.num_blocks - 1


def test_cancel_parked_request(setup):
    cfg, params = setup
    eng = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                          sp=_greedy_sp(), steps_per_dispatch=4,
                          min_stage=32, prefill_ahead=True, park_rows=2)
    occupant = eng.submit(np.arange(3, 20, dtype=np.int32), 60, eos_id=-1)
    victim = eng.submit(np.array([5, 6, 7], np.int32), 30, eos_id=-1)
    polls = 0
    done = []
    cancelled = False
    while eng.has_work():
        done.extend(eng.poll())
        polls += 1
        if polls == 3 and not cancelled:
            # by now the victim is parked (pool of 1 is saturated)
            cancelled = eng.cancel(victim)
    assert cancelled
    by_id = {c.request_id: c for c in done}
    assert victim not in by_id
    assert occupant in by_id
    assert len(eng._free_park_rows) == 2


def test_warmup_covers_park_and_attach_programs(setup):
    """warmup() must precompile the park + attach programs so serving
    never hits a cold compile; afterwards a saturated run adds no new park
    jit entries for warmed (bucket, group) keys."""
    cfg, params = setup
    eng = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                          sp=_greedy_sp(), steps_per_dispatch=4,
                          min_stage=32, prefill_ahead=True, park_rows=4)
    eng.warmup(prompt_buckets=(64,))
    park_keys = set(eng._park_cache_jits)
    attach_keys = set(eng._attach_cache_jits)
    assert park_keys and attach_keys
    rng = np.random.default_rng(3)
    prompts, budgets = _load(rng, 8)
    _run(eng, prompts, budgets)
    assert set(eng._park_cache_jits) == park_keys
    assert set(eng._attach_cache_jits) == attach_keys


def test_cancel_pending_park_group(setup):
    """Cancel a request whose park group is in flight (preview not yet
    fetched): the id must cancel cleanly, its park row must recycle, and
    the other requests must be unaffected."""
    cfg, params = setup
    eng = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                          sp=_greedy_sp(), steps_per_dispatch=4,
                          min_stage=32, prefill_ahead=True, park_rows=4)
    occupant = eng.submit(np.arange(3, 20, dtype=np.int32), 40, eos_id=-1)
    victim = eng.submit(np.array([5, 6, 7], np.int32), 30, eos_id=-1)
    other = eng.submit(np.array([9, 10, 11], np.int32), 20, eos_id=-1)
    # first poll issues the park program for victim+other; cancel while
    # the preview future is pending
    eng._admit()
    assert eng._pending_parks
    assert eng.cancel(victim)
    done = list(eng.run())
    by_id = {c.request_id for c in done}
    assert victim not in by_id
    assert occupant in by_id and other in by_id
    assert len(eng._free_park_rows) == 4
