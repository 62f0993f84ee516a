"""Staged-dispatch engine KV cache + admission policy (VERDICT r3 items 1/2/8).

The engine right-sizes each decode dispatch's KV read to the pool's
occupancy high-water mark: contiguous engines slice the cache to the
dispatch stage (scattering the region back afterwards), paged engines slice
the block table's width. Both must be bit-exact vs the unstaged engine —
attention is masked by per-slot lengths, so reading fewer dead slots cannot
change any active slot's math.
"""

import jax
import numpy as np
import pytest

from tts_max_tpu.inference.engine import InferenceEngine, PagedInferenceEngine
from tts_max_tpu.ops.sampling import SamplingParams
from tts_max_tpu.models import llama


@pytest.fixture(scope="module")
def setup():
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=512)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _greedy_sp():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0,
                          frequency_penalty=0.0)


def _mixed_load(rng, n):
    prompts = [rng.integers(3, 60, rng.choice([4, 9, 33])).astype(np.int32)
               for _ in range(n)]
    budgets = [int(rng.integers(5, 90)) for _ in range(n)]
    return prompts, budgets


def _run(engine, prompts, budgets):
    ids = [engine.submit(p, b, eos_id=-1, sampling_seed=i)
           for i, (p, b) in enumerate(zip(prompts, budgets))]
    by_id = {c.request_id: c for c in engine.run()}
    return [by_id[i].tokens for i in ids]


@pytest.mark.parametrize("k", [1, 4])
def test_staged_contiguous_matches_unstaged(setup, k):
    """Mixed lengths/budgets across several stages, with finishes and
    re-admissions forcing the stage to grow AND shrink mid-run."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts, budgets = _mixed_load(rng, 10)
    kw = dict(max_batch=3, max_len=256, sp=_greedy_sp(),
              steps_per_dispatch=k)
    ref = InferenceEngine(params, cfg, staged_cache=False, **kw)
    ref_out = _run(ref, prompts, budgets)
    eng = InferenceEngine(params, cfg, staged_cache=True, min_stage=32, **kw)
    out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)
    if k > 1:
        # the run must actually have exercised more than one stage program
        assert len(eng._decode_k_cache) > 1, eng._decode_k_cache.keys()


def test_staged_paged_matches_unstaged(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    prompts, budgets = _mixed_load(rng, 8)
    kw = dict(max_batch=3, max_len=256, block_size=32, sp=_greedy_sp(),
              steps_per_dispatch=4, enable_prefix_cache=True)
    ref = PagedInferenceEngine(params, cfg, staged_cache=False, **kw)
    ref_out = _run(ref, prompts, budgets)
    eng = PagedInferenceEngine(params, cfg, staged_cache=True, min_stage=32,
                               **kw)
    out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)
    assert len(eng._decode_k_cache) > 1


def test_staged_quantized_kv_matches(setup):
    cfg, params = setup
    rng = np.random.default_rng(2)
    prompts, budgets = _mixed_load(rng, 6)
    kw = dict(max_batch=2, max_len=256, sp=_greedy_sp(),
              steps_per_dispatch=4, quantized_kv=True)
    ref = InferenceEngine(params, cfg, staged_cache=False, **kw)
    ref_out = _run(ref, prompts, budgets)
    eng = InferenceEngine(params, cfg, staged_cache=True, min_stage=32, **kw)
    out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)


def test_staged_cancel_under_pipelined_dispatch(setup):
    """Cancel mid-flight while staged: the cancelled slot's stagnant length
    may exceed a later (shrunken) stage — the write guard must keep the
    survivors' tokens identical to an uncancelled solo run."""
    cfg, params = setup
    long_p = np.arange(3, 40, dtype=np.int32)
    short_p = np.array([7, 8, 9], dtype=np.int32)
    eng = InferenceEngine(params, cfg, max_batch=2, max_len=256,
                          sp=_greedy_sp(), steps_per_dispatch=4,
                          staged_cache=True, min_stage=32)
    rid_long = eng.submit(long_p, 180, eos_id=-1, sampling_seed=0)
    rid_short = eng.submit(short_p, 60, eos_id=-1, sampling_seed=1)
    done = []
    polls = 0
    while eng.has_work():
        done.extend(eng.poll())
        polls += 1
        if polls == 3:
            assert eng.cancel(rid_long)
    by_id = {c.request_id: c for c in done}
    assert rid_long not in by_id
    solo = InferenceEngine(params, cfg, max_batch=1, max_len=256,
                           sp=_greedy_sp(), steps_per_dispatch=4,
                           staged_cache=True, min_stage=32)
    [ref] = solo.generate_all([short_p], 60, eos_id=-1, seed=1)
    np.testing.assert_array_equal(by_id[rid_short].tokens, ref.tokens)


def test_warmup_covers_all_stage_programs(setup):
    cfg, params = setup
    eng = InferenceEngine(params, cfg, max_batch=2, max_len=256,
                          sp=_greedy_sp(), steps_per_dispatch=4,
                          staged_cache=True, min_stage=64)
    eng.warmup(prompt_buckets=(64,))
    assert set(eng._decode_k_cache) == {64, 128, None}
    # serving after warmup stays correct
    [c] = eng.generate_all([np.array([5, 6], np.int32)], 4, eos_id=-1)
    assert len(c.tokens) == 4


def test_shortest_admission_policy(setup):
    """Under a full pool, the short job admitted after a long queue must
    finish first under 'shortest' (and not under FIFO)."""
    cfg, params = setup
    rng = np.random.default_rng(3)

    def build(policy):
        eng = InferenceEngine(params, cfg, max_batch=1, max_len=256,
                              sp=_greedy_sp(), steps_per_dispatch=4,
                              admission_policy=policy)
        # occupant fills the single slot; then a long and a short request
        occ = eng.submit(np.array([3, 4], np.int32), 8, eos_id=-1)
        r_long = eng.submit(rng.integers(3, 60, 30).astype(np.int32), 100,
                            eos_id=-1)
        r_short = eng.submit(np.array([5], np.int32), 5, eos_id=-1)
        order = [c.request_id for c in eng.run()]
        return occ, r_long, r_short, order

    occ, r_long, r_short, order = build("shortest")
    assert order.index(r_short) < order.index(r_long)
    occ, r_long, r_short, order = build("fifo")
    assert order.index(r_long) < order.index(r_short)


def test_admission_policy_validation(setup):
    cfg, params = setup
    with pytest.raises(ValueError):
        InferenceEngine(params, cfg, admission_policy="sjf")


@pytest.mark.parametrize("quantized_kv", [False, True])
def test_delta_kv_matches_conventional(setup, quantized_kv):
    """delta_kv dispatches (read-only cache + per-dispatch commit) must
    reproduce the conventional write-then-attend engine. fp32 compute:
    the split cache/delta softmax sums the same logits in a different
    order, and a random tiny model's near-uniform bf16 logits flip greedy
    on last-ulp wobble (int8 KV additionally attends delta rows
    unquantized within their dispatch). For quantized_kv=True the two
    engines thus compute genuinely different logits on rows attended
    inside a dispatch window — the assert is on greedy TOKENS, which
    agree because int8 rounding on a handful of rows sits far below this
    model's logit margins at these pinned seeds. Keep the seeds pinned;
    exact-logit equality is impossible by construction when quantized."""
    import dataclasses

    import jax.numpy as jnp

    cfg, params = setup
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    prompts, budgets = _mixed_load(rng, 8)
    kw = dict(max_batch=3, max_len=256, sp=_greedy_sp(),
              steps_per_dispatch=4, min_stage=32,
              quantized_kv=quantized_kv)
    ref = InferenceEngine(params, cfg, delta_kv=False, **kw)
    ref_out = _run(ref, prompts, budgets)
    eng = InferenceEngine(params, cfg, delta_kv=True, **kw)
    out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)


@pytest.mark.parametrize("quantized_kv", [False, True])
def test_delta_kv_paged_matches_conventional(setup, quantized_kv):
    """Paged delta-KV (gather the table's span once per dispatch, run the
    contiguous delta scan, commit through the table) must reproduce the
    conventional per-step paged scatter engine. fp32 for the same
    near-tie reason as the contiguous test; prefix caching on so shared
    blocks are gathered per referencing row and commits provably never
    touch them. As in the contiguous test, quantized_kv=True compares
    greedy TOKENS (not logits): delta rows attend unquantized within
    their dispatch so logits differ by int8 rounding on those rows —
    below this model's margins at the pinned seed. Keep seeds pinned."""
    import dataclasses

    import jax.numpy as jnp

    cfg, params = setup
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    prompts, budgets = _mixed_load(rng, 8)
    # force shared prefixes: a 33-token common prefix (one full 32-block +
    # a partial) on prompts 0-3 so later admissions hit the cached block
    shared = rng.integers(3, 60, 33).astype(np.int32)
    for i in range(4):
        prompts[i] = np.concatenate([shared, prompts[i]])
    kw = dict(max_batch=3, max_len=256, block_size=32, sp=_greedy_sp(),
              steps_per_dispatch=4, min_stage=32,
              quantized_kv=quantized_kv, enable_prefix_cache=True)
    ref = PagedInferenceEngine(params, cfg, delta_kv=False, **kw)
    ref_out = _run(ref, prompts, budgets)
    eng = PagedInferenceEngine(params, cfg, delta_kv=True, **kw)
    out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)
    assert eng.prefix_cache_hits > 0


def test_delta_kv_paged_cancel_and_readmission(setup):
    """Cancel mid-flight under pipelined paged delta dispatches: deferred
    block frees + the delta commit's sink routing must leave the
    survivor's tokens identical to a solo run."""
    cfg, params = setup
    long_p = np.arange(3, 40, dtype=np.int32)
    short_p = np.array([7, 8, 9], dtype=np.int32)
    kw = dict(max_batch=2, max_len=256, block_size=32, sp=_greedy_sp(),
              steps_per_dispatch=4, min_stage=32, delta_kv=True)
    eng = PagedInferenceEngine(params, cfg, **kw)
    rid_long = eng.submit(long_p, 180, eos_id=-1, sampling_seed=0)
    rid_short = eng.submit(short_p, 60, eos_id=-1, sampling_seed=1)
    done = []
    polls = 0
    while eng.has_work():
        done.extend(eng.poll())
        polls += 1
        if polls == 3:
            assert eng.cancel(rid_long)
    by_id = {c.request_id: c for c in done}
    assert rid_long not in by_id
    solo = PagedInferenceEngine(params, cfg, max_batch=1, max_len=256,
                                block_size=32, sp=_greedy_sp(),
                                steps_per_dispatch=4, min_stage=32,
                                delta_kv=True)
    [ref] = solo.generate_all([short_p], 60, eos_id=-1, seed=1)
    np.testing.assert_array_equal(by_id[rid_short].tokens, ref.tokens)


def test_delta_kv_cancel_and_readmission(setup):
    cfg, params = setup
    long_p = np.arange(3, 40, dtype=np.int32)
    short_p = np.array([7, 8, 9], dtype=np.int32)
    eng = InferenceEngine(params, cfg, max_batch=2, max_len=256,
                          sp=_greedy_sp(), steps_per_dispatch=4,
                          min_stage=32, delta_kv=True)
    rid_long = eng.submit(long_p, 180, eos_id=-1, sampling_seed=0)
    rid_short = eng.submit(short_p, 60, eos_id=-1, sampling_seed=1)
    done = []
    polls = 0
    while eng.has_work():
        done.extend(eng.poll())
        polls += 1
        if polls == 3:
            assert eng.cancel(rid_long)
    by_id = {c.request_id: c for c in done}
    solo = InferenceEngine(params, cfg, max_batch=1, max_len=256,
                           sp=_greedy_sp(), steps_per_dispatch=4,
                           min_stage=32, delta_kv=True)
    [ref] = solo.generate_all([short_p], 60, eos_id=-1, seed=1)
    np.testing.assert_array_equal(by_id[rid_short].tokens, ref.tokens)


def test_persistent_read_cache_matches_gather_mode(setup):
    """persistent_read_cache=True (round 5: the contiguous mirror kept
    alive across dispatches) must be bit-exact vs the per-dispatch gather
    mode — both buffers receive identical writes (prefill scatter + delta
    commits) and garbage rows are masked by base_lengths. Load includes
    prefix-cache hits (suffix admissions write the mirror too), finishes
    and re-admissions (stale mirror rows from a previous occupant must
    never leak into a successor's attention)."""
    cfg, params = setup
    rng = np.random.default_rng(23)
    prompts, budgets = _mixed_load(rng, 10)
    shared = rng.integers(3, 60, 40).astype(np.int32)
    for i in range(5):
        prompts[i] = np.concatenate([shared, prompts[i]])
    kw = dict(max_batch=3, max_len=256, block_size=32, sp=_greedy_sp(),
              steps_per_dispatch=4, min_stage=32,
              enable_prefix_cache=True, delta_kv=True)
    ref = PagedInferenceEngine(params, cfg, persistent_read_cache=False,
                               **kw)
    assert ref.read_cache is None
    ref_out = _run(ref, prompts, budgets)
    eng = PagedInferenceEngine(params, cfg, persistent_read_cache=True,
                               **kw)
    assert eng.read_cache is not None
    out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)
    assert eng.prefix_cache_hits > 0


def test_persistent_read_cache_quantized_kv(setup):
    """Same mirror-vs-gather equivalence with an int8 KV pool: commits
    quantize identically into both buffers, so even quantized serving is
    bit-exact between the modes (this compares the two PAGED modes, not
    paged vs contiguous)."""
    cfg, params = setup
    rng = np.random.default_rng(29)
    prompts, budgets = _mixed_load(rng, 8)
    kw = dict(max_batch=3, max_len=256, block_size=32, sp=_greedy_sp(),
              steps_per_dispatch=4, min_stage=32, quantized_kv=True,
              delta_kv=True)
    ref = PagedInferenceEngine(params, cfg, persistent_read_cache=False,
                               **kw)
    ref_out = _run(ref, prompts, budgets)
    eng = PagedInferenceEngine(params, cfg, persistent_read_cache=True,
                               **kw)
    out = _run(eng, prompts, budgets)
    for r, o in zip(ref_out, out):
        np.testing.assert_array_equal(r, o)
