"""Continuous-batching engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.inference.engine import InferenceEngine
from tts_max_tpu.inference.generate import generate
from tts_max_tpu.models import llama
from tts_max_tpu.ops.sampling import SamplingParams


@pytest.fixture(scope="module")
def setup():
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _greedy_sp():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0,
                          frequency_penalty=0.0)


def test_engine_single_request_matches_generate(setup):
    cfg, params = setup
    engine = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                             sp=_greedy_sp())
    prompt = np.array([5, 9, 42, 7, 3], dtype=np.int32)
    [comp] = engine.generate_all([prompt], max_new_tokens=8, eos_id=-1)
    assert comp.finish_reason == "length"
    assert len(comp.tokens) == 8

    # reference: the monolithic jitted generate (greedy, same model)
    ref = generate(
        params, cfg, jnp.asarray(np.pad(prompt, (0, 64 - 5))[None]),
        jnp.asarray([5], jnp.int32), jax.random.PRNGKey(0),
        sp=_greedy_sp(), max_new_tokens=8, eos_id=-1, cache_len=128,
    )
    np.testing.assert_array_equal(comp.tokens, np.asarray(ref.tokens[0]))


def test_engine_concurrent_requests_match_individual(setup):
    """Three greedy requests running concurrently in the pool must produce
    the same tokens as each run alone — slot isolation."""
    cfg, params = setup
    prompts = [
        np.array([1, 2, 3], dtype=np.int32),
        np.array([10, 20, 30, 40, 50, 60], dtype=np.int32),
        np.array([7], dtype=np.int32),
    ]
    engine = InferenceEngine(params, cfg, max_batch=4, max_len=128,
                             sp=_greedy_sp())
    batch_results = engine.generate_all(prompts, max_new_tokens=6, eos_id=-1)

    for p, res in zip(prompts, batch_results):
        solo = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                               sp=_greedy_sp())
        [ref] = solo.generate_all([p], max_new_tokens=6, eos_id=-1)
        np.testing.assert_array_equal(res.tokens, ref.tokens)


def test_engine_continuous_admission(setup):
    """A request submitted mid-flight joins without disturbing the running
    one (continuous batching semantics)."""
    cfg, params = setup
    engine = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                             sp=_greedy_sp())
    p1 = np.array([4, 5, 6], dtype=np.int32)
    p2 = np.array([8, 9], dtype=np.int32)
    engine.submit(p1, max_new_tokens=10, eos_id=-1)
    # run 4 steps, then admit the second request mid-generation
    for _ in range(4):
        engine.step()
    engine.submit(p2, max_new_tokens=5, eos_id=-1)
    done = engine.run()
    assert len(done) == 2
    by_id = {c.request_id: c for c in done}
    # compare against solo runs
    solo = InferenceEngine(params, cfg, max_batch=1, max_len=128, sp=_greedy_sp())
    [r1] = solo.generate_all([p1], max_new_tokens=10, eos_id=-1)
    solo2 = InferenceEngine(params, cfg, max_batch=1, max_len=128, sp=_greedy_sp())
    [r2] = solo2.generate_all([p2], max_new_tokens=5, eos_id=-1)
    np.testing.assert_array_equal(by_id[0].tokens, r1.tokens)
    np.testing.assert_array_equal(by_id[1].tokens, r2.tokens)


def test_engine_queue_overflow_and_slot_reuse(setup):
    """More requests than slots: the queue drains as slots free."""
    cfg, params = setup
    engine = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                             sp=_greedy_sp())
    prompts = [np.array([i + 1, i + 2], dtype=np.int32) for i in range(5)]
    done = engine.generate_all(prompts, max_new_tokens=4, eos_id=-1)
    assert len(done) == 5
    assert all(len(c.tokens) == 4 for c in done)


def test_engine_eos_stops_early(setup):
    cfg, params = setup
    # find greedy first token, then declare it EOS
    engine = InferenceEngine(params, cfg, max_batch=1, max_len=128, sp=_greedy_sp())
    p = np.array([11, 12, 13], dtype=np.int32)
    [probe] = engine.generate_all([p], max_new_tokens=3, eos_id=-1)
    first = int(probe.tokens[0])
    engine2 = InferenceEngine(params, cfg, max_batch=1, max_len=128, sp=_greedy_sp())
    [res] = engine2.generate_all([p], max_new_tokens=10, eos_id=first)
    assert res.finish_reason == "eos"
    assert len(res.tokens) == 1


def test_engine_with_int8_params(setup):
    """The continuous-batching engine serves quantized weights unchanged."""
    from tts_max_tpu.models import quantization as quant

    cfg, params = setup
    qparams = quant.quantize_llama_params(params)
    engine = InferenceEngine(qparams, cfg, max_batch=2, max_len=128,
                             sp=_greedy_sp())
    prompts = [np.array([3, 4, 5], dtype=np.int32),
               np.array([9, 8], dtype=np.int32)]
    done = engine.generate_all(prompts, max_new_tokens=5, eos_id=-1)
    assert len(done) == 2
    assert all(len(c.tokens) == 5 for c in done)


def test_engine_vocab_window(setup):
    """Windowed engines: full-vocab window reproduces the unconstrained
    engine; a narrow window constrains every emitted id, for the paged
    engine too."""
    from tts_max_tpu.inference.engine import PagedInferenceEngine

    cfg, params = setup
    prompts = [
        np.array([5, 9, 42, 7, 3], dtype=np.int32),
        np.array([30, 31], dtype=np.int32),
    ]
    ref = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                          sp=_greedy_sp())
    ref_out = ref.generate_all(prompts, max_new_tokens=8, eos_id=-1)

    ident = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                            sp=_greedy_sp(), vocab_window=(0, cfg.vocab_size))
    ident_out = ident.generate_all(prompts, max_new_tokens=8, eos_id=-1)
    for a, b in zip(ref_out, ident_out):
        np.testing.assert_array_equal(a.tokens, b.tokens)

    lo, size = 24, 16
    for eng_cls, kw in (
        (InferenceEngine, {}),
        (PagedInferenceEngine, {"block_size": 64}),
    ):
        eng = eng_cls(params, cfg, max_batch=2, max_len=128,
                      sp=SamplingParams(temperature=0.9, top_k=8),
                      vocab_window=(lo, size), **kw)
        for comp in eng.generate_all(prompts, max_new_tokens=8, eos_id=-1,
                                     seed=3):
            toks = np.asarray(comp.tokens)
            assert ((toks >= lo) & (toks < lo + size)).all(), toks


def test_engine_per_request_sampling(setup):
    """A greedy request and a high-temperature request run concurrently,
    each honoring its own SamplingParams (vLLM per-request parity)."""
    cfg, params = setup
    engine = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                             sp=SamplingParams(temperature=0.9, top_k=8))
    prompt = np.array([5, 9, 42, 7, 3], dtype=np.int32)
    greedy_id = engine.submit(prompt, 8, eos_id=-1,
                              sampling=SamplingParams(
                                  temperature=0.0, repetition_penalty=1.0,
                                  frequency_penalty=0.0))
    hot_id = engine.submit(prompt, 8, eos_id=-1, sampling_seed=5)
    by_id = {c.request_id: c for c in engine.run()}

    solo = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                           sp=_greedy_sp())
    [ref] = solo.generate_all([prompt], max_new_tokens=8, eos_id=-1)
    np.testing.assert_array_equal(by_id[greedy_id].tokens, ref.tokens)
    assert len(by_id[hot_id].tokens) == 8

    # slot reuse must reset the row to the engine default (sampled != greedy
    # engine default here, so just check the greedy override didn't stick:
    # same seed through the default params gives the same tokens twice)
    a = engine.generate_all([prompt], max_new_tokens=8, eos_id=-1, seed=9)
    b = engine.generate_all([prompt], max_new_tokens=8, eos_id=-1, seed=9)
    np.testing.assert_array_equal(a[0].tokens, b[0].tokens)


def test_engine_per_request_top_p(setup):
    """A top_p request re-jits the decode step once (use_top_p static flag)
    and constrains sampling; greedy parity is unaffected."""
    cfg, params = setup
    engine = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                             sp=_greedy_sp())
    assert engine.bsp.use_top_p is False
    prompt = np.array([5, 9, 42], dtype=np.int32)
    rid = engine.submit(prompt, 6, eos_id=-1,
                        sampling=SamplingParams(temperature=1.0, top_k=0,
                                                top_p=0.05))
    gid = engine.submit(prompt, 6, eos_id=-1,
                        sampling=SamplingParams(temperature=0.0,
                                                repetition_penalty=1.0,
                                                frequency_penalty=0.0))
    by_id = {c.request_id: c for c in engine.run()}
    assert engine.bsp.use_top_p is True
    # p=0.05 is ultra-peaked: the nucleus is (almost always) the argmax, so
    # the sampled row behaves near-greedily — and the greedy row must equal
    # the solo greedy run exactly
    solo = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                           sp=_greedy_sp())
    [ref] = solo.generate_all([prompt], max_new_tokens=6, eos_id=-1)
    np.testing.assert_array_equal(by_id[gid].tokens, ref.tokens)
    assert len(by_id[rid].tokens) == 6


def test_serve_batch_cli(tmp_path):
    """tools/serve_batch.py end-to-end on a tiny exported model: JSONL
    requests -> engine -> wavs."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from tts_max_tpu.models import hf_import
    from tools import serve_batch

    cfg = llama.tiny_config(vocab_size=512, max_seq_len=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    model_dir = str(tmp_path / "model")
    hf_import.save_model_to_hf_dir(params, cfg, model_dir)

    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text(
        json.dumps({"text": "a", "max_tokens": 6}) + "\n"
        + json.dumps({"text": "bb", "max_tokens": 5, "temperature": 0.0,
                      "repetition_penalty": 1.0, "frequency_penalty": 0.0})
        + "\n"
    )
    out_dir = tmp_path / "wavs"
    serve_batch.main([
        "--model_dir", model_dir, "--requests", str(reqs),
        "--out_dir", str(out_dir), "--max_batch", "2", "--max_len", "256",
        "--max_tokens", "6",
    ])
    import os
    assert sorted(os.listdir(out_dir)) == ["req_0.wav", "req_1.wav"]


def test_engine_min_tokens(setup):
    """Per-request min_tokens masks EOS until that many tokens generated."""
    cfg, params = setup
    prompt = np.array([5, 9, 42, 7, 3], dtype=np.int32)
    probe = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                            sp=_greedy_sp())
    [c] = probe.generate_all([prompt], max_new_tokens=1, eos_id=-1)
    first = int(c.tokens[0])

    eng = InferenceEngine(params, cfg, max_batch=2, max_len=128,
                          sp=_greedy_sp())
    stop_id = eng.submit(prompt, 12, eos_id=first)
    min_id = eng.submit(prompt, 12, eos_id=first, min_tokens=5)
    by_id = {c.request_id: c for c in eng.run()}
    assert len(by_id[stop_id].tokens) == 1  # immediate EOS
    toks = by_id[min_id].tokens
    assert len(toks) >= 5
    assert (toks[:4] != first).all()


def test_engine_stats(setup):
    cfg, params = setup
    from tts_max_tpu.inference.engine import PagedInferenceEngine

    eng = PagedInferenceEngine(params, cfg, max_batch=2, max_len=128,
                               block_size=64, sp=_greedy_sp(),
                               enable_prefix_cache=True)
    s0 = eng.stats()
    assert s0["active_slots"] == 0 and s0["free_blocks"] == eng.num_blocks - 1  # block 0 = sink
    eng.submit(np.array([5, 9, 42], dtype=np.int32), 4, eos_id=-1)
    eng.step()
    s1 = eng.stats()
    assert s1["active_slots"] == 1 and s1["used_blocks"] > 0
    eng.run()
    s2 = eng.stats()
    assert s2["active_slots"] == 0
    assert s2["free_blocks"] + s2["cached_blocks"] == eng.num_blocks - 1


def test_engine_cancel(setup):
    """cancel(): queued requests drop, mid-flight requests free their slot
    (paged: blocks return to the pool) without disturbing others."""
    from tts_max_tpu.inference.engine import PagedInferenceEngine

    cfg, params = setup
    eng = PagedInferenceEngine(params, cfg, max_batch=1, max_len=128,
                               block_size=64, sp=_greedy_sp())
    p = np.array([5, 9, 42], dtype=np.int32)
    keep = eng.submit(p, 6, eos_id=-1)
    queued = eng.submit(p, 6, eos_id=-1)  # waits: only 1 slot
    eng.step()
    assert eng.cancel(queued) is True  # still in queue
    eng.step()
    mid = None
    assert eng.cancel(12345) is False
    done = eng.run()
    assert [c.request_id for c in done] == [keep]
    assert len(done[0].tokens) == 6

    # mid-flight cancel frees blocks
    a = eng.submit(p, 6, eos_id=-1)
    eng.step(); eng.step()
    assert eng.cancel(a) is True
    assert not eng.has_work()
    assert (eng._refs == 0).all()
    s = eng.stats()
    assert s["free_blocks"] + s["cached_blocks"] == eng.num_blocks - 1


def test_engine_multi_step_dispatch_matches_single(setup):
    """steps_per_dispatch>1 (K decode steps per jitted lax.scan dispatch,
    in-program EOS/budget finish) must produce IDENTICAL tokens to the
    per-step engine: each slot's sampling depends only on its own
    request-seeded RNG stream and its own history, never on scheduling.
    Covers sampling + penalties, queueing (5 requests / 2 slots), and a
    budget that is not a multiple of K."""
    cfg, params = setup
    sp = SamplingParams(temperature=0.8, top_k=8, repetition_penalty=1.1,
                        frequency_penalty=0.3)
    prompts = [np.array([i + 1, i + 2, i + 3], dtype=np.int32)
               for i in range(5)]

    ref = InferenceEngine(params, cfg, max_batch=2, max_len=128, sp=sp)
    want = ref.generate_all(prompts, max_new_tokens=7, eos_id=-1, seed=11)

    # delta_kv=False: this test pins the SCHEDULING invariant (K-step vs
    # per-step dispatch) bit-exactly on a bf16 model; the delta-KV
    # formulation's reordered softmax sums are equivalence-tested
    # separately in fp32 (test_engine_staged.test_delta_kv_matches_*)
    multi = InferenceEngine(params, cfg, max_batch=2, max_len=128, sp=sp,
                            steps_per_dispatch=4, delta_kv=False)
    got = multi.generate_all(prompts, max_new_tokens=7, eos_id=-1, seed=11)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w.tokens, g.tokens)
        assert w.finish_reason == g.finish_reason


def test_engine_multi_step_eos_and_min_tokens(setup):
    """In-program finish honors EOS and min_tokens exactly like the
    host-side path."""
    cfg, params = setup
    p = np.array([11, 12, 13], dtype=np.int32)
    probe = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                            sp=_greedy_sp())
    [r] = probe.generate_all([p], max_new_tokens=3, eos_id=-1)
    first = int(r.tokens[0])

    eng = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                          sp=_greedy_sp(), steps_per_dispatch=8)
    [res] = eng.generate_all([p], max_new_tokens=10, eos_id=first)
    assert res.finish_reason == "eos"
    assert len(res.tokens) == 1

    eng2 = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                           sp=_greedy_sp(), steps_per_dispatch=8)
    eng2.submit(p, 10, eos_id=first, min_tokens=4)
    [res2] = eng2.run()
    assert len(res2.tokens) >= 4


def test_paged_engine_multi_step_with_prefix_cache(setup):
    """Multi-step dispatch composes with paged KV + prefix caching."""
    from tts_max_tpu.inference.engine import PagedInferenceEngine

    cfg, params = setup
    shared = np.arange(1, 65, dtype=np.int32) % 60 + 1  # one full block
    prompts = [np.concatenate([shared, np.array([i + 1], dtype=np.int32)])
               for i in range(3)]

    ref = InferenceEngine(params, cfg, max_batch=2, max_len=256,
                          sp=_greedy_sp())
    want = ref.generate_all(prompts, max_new_tokens=6, eos_id=-1)

    eng = PagedInferenceEngine(params, cfg, max_batch=2, max_len=256,
                               block_size=64, sp=_greedy_sp(),
                               enable_prefix_cache=True,
                               steps_per_dispatch=4)
    got = eng.generate_all(prompts, max_new_tokens=6, eos_id=-1)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w.tokens, g.tokens)
    assert eng.prefix_cache_hits > 0
    assert (eng._refs == 0).all()


def test_engine_multi_step_int4_no_warning(setup):
    """Packed-int4 params are engine-viable with steps_per_dispatch>1 (the
    S4 view unpacks once per K-step program) — no degradation warning, and
    greedy tokens match the single-program generate path."""
    import warnings

    from tts_max_tpu.models import quantization as quant

    cfg, params = setup
    qparams = quant.quantize_llama_params(params, bits=4)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        eng = InferenceEngine(qparams, cfg, max_batch=2, max_len=128,
                              sp=_greedy_sp(), steps_per_dispatch=4)
    p = np.array([5, 9, 42, 7], dtype=np.int32)
    [comp] = eng.generate_all([p], max_new_tokens=8, eos_id=-1)
    ref = generate(
        params=qparams, cfg=cfg,
        prompt_tokens=jnp.asarray(np.pad(p, (0, 60))[None]),
        prompt_lengths=jnp.asarray([4], jnp.int32),
        rng=jax.random.PRNGKey(0), sp=_greedy_sp(), max_new_tokens=8,
        eos_id=-1, cache_len=128,
    )
    np.testing.assert_array_equal(comp.tokens, np.asarray(ref.tokens[0]))


def test_paged_sink_block_never_allocated_or_corrupted(setup):
    """Block 0 is a reserved write sink: idle/released slots and
    budget-finished slots scatter their dangling pad-token KV there, so it
    must never be allocated to a request or prefix-registered. Regression:
    a released slot's zeroed table row used to dribble pad KV into block 0
    every remaining step, silently corrupting whichever live request owned
    it (advisor round-2 high finding)."""
    from tts_max_tpu.inference.engine import PagedInferenceEngine

    cfg, params = setup
    bs = 32
    # pool sized so the OLD allocator would have handed block 0 to the last
    # admission; request A budget-finishes exactly on a block boundary
    # ((prompt+budget) % bs == 0 -> past-allocation table index), request B
    # keeps decoding long after A's slot goes idle.
    pa = np.array([5, 9, 42], dtype=np.int32)  # bucket 64 = 2 blocks
    pb = np.array([7, 11, 13], dtype=np.int32)
    eng = PagedInferenceEngine(params, cfg, max_batch=2, max_len=128,
                               block_size=bs, num_blocks=9, sp=_greedy_sp(),
                               enable_prefix_cache=True,
                               steps_per_dispatch=4)
    a = eng.submit(pa, 64 - len(pa), eos_id=-1)  # ends on block boundary
    b = eng.submit(pb, 40, eos_id=-1)
    done = {c.request_id: c for c in eng.run()}
    assert 0 not in {blk for row in eng._slot_blocks for blk in row}
    assert 0 not in eng._free_blocks and 0 not in eng._evictable
    assert 0 not in eng._hash_of and eng._refs[0] == 0

    solo = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                           sp=_greedy_sp())
    [rb] = solo.generate_all([pb], max_new_tokens=40, eos_id=-1)
    np.testing.assert_array_equal(done[b].tokens, rb.tokens)
    assert len(done[a].tokens) == 64 - len(pa)


def test_engine_warmup_compiles_and_preserves_state(setup):
    """warmup() pre-compiles every (bucket, group) prefill variant + the
    decode program without perturbing results: a post-warmup engine must
    produce the same tokens as a cold one, and warmup must populate the
    prefill program cache."""
    from tts_max_tpu.inference.engine import PagedInferenceEngine

    cfg, params = setup
    prompts = [np.array([i + 1, i + 2, i + 3], dtype=np.int32)
               for i in range(3)]
    cold = PagedInferenceEngine(params, cfg, max_batch=2, max_len=128,
                                block_size=64, sp=_greedy_sp(),
                                enable_prefix_cache=True)
    want = cold.generate_all(prompts, max_new_tokens=5, eos_id=-1)

    warm = PagedInferenceEngine(params, cfg, max_batch=2, max_len=128,
                                block_size=64, sp=_greedy_sp(),
                                enable_prefix_cache=True)
    warm.warmup(prompt_buckets=(64,))
    assert len(warm._prefill_cache) == len(warm.prefill_group_sizes)
    # warmup wrote only to the sink block / idle regions: free list intact
    assert sorted(warm._free_blocks) == list(range(1, warm.num_blocks))
    got = warm.generate_all(prompts, max_new_tokens=5, eos_id=-1)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w.tokens, g.tokens)


def test_engine_batched_admission_groups(setup):
    """A burst of queued requests admits through grouped prefill (one
    device call per group) and still matches solo outputs exactly."""
    cfg, params = setup
    prompts = [np.array([7 * i + 1, 7 * i + 2], dtype=np.int32)
               for i in range(6)]
    eng = InferenceEngine(params, cfg, max_batch=6, max_len=128,
                          sp=_greedy_sp(), prefill_group_sizes=(4, 2, 1))
    done = {c.request_id: c for c in eng.generate_all(
        prompts, max_new_tokens=5, eos_id=-1)}
    # grouped programs were compiled (6 = 4 + 2)
    assert {k[1] for k in eng._prefill_cache} == {4, 2}
    for i, p in enumerate(prompts):
        solo = InferenceEngine(params, cfg, max_batch=1, max_len=128,
                               sp=_greedy_sp())
        [r] = solo.generate_all([p], max_new_tokens=5, eos_id=-1)
        np.testing.assert_array_equal(done[i].tokens, r.tokens)


def test_engine_cancel_during_pipelined_dispatch(setup):
    """cancel() while a pipelined dispatch is in flight must NOT recycle the
    cancelled slot's KV blocks until that dispatch's blob is processed (the
    in-flight program still scatters KV through the snapshotted table), and
    a request admitted into the freed slot must generate exactly what it
    would in a fresh engine."""
    from tts_max_tpu.inference.engine import PagedInferenceEngine

    cfg, params = setup

    def make():
        return PagedInferenceEngine(params, cfg, max_batch=2, max_len=128,
                                    block_size=32, sp=_greedy_sp(),
                                    steps_per_dispatch=4)

    eng = make()
    p = np.array([5, 9, 42, 7], dtype=np.int32)
    victim = eng.submit(p, 40, eos_id=-1)
    eng.poll()  # admit + dispatch in flight
    assert eng._pending_dispatch is not None
    held = list(eng._slot_blocks[0])
    assert held
    assert eng.cancel(victim) is True
    # blocks parked, not freed: not allocatable, refs still held
    assert eng._deferred_free == held
    assert all(b not in eng._free_blocks for b in held)
    assert all(eng._refs[b] > 0 for b in held)
    # admit a new request into the freed slot while the old dispatch is
    # still in flight; drive both to completion
    p2 = np.array([11, 3, 8], dtype=np.int32)
    rid2 = eng.submit(p2, 12, eos_id=-1)
    done = eng.run()
    assert [c.request_id for c in done] == [rid2]
    # deferral flushed; pool fully recovered (sink block 0 excluded)
    assert eng._deferred_free == []
    assert not eng.has_work()
    s = eng.stats()
    assert s["free_blocks"] + s["cached_blocks"] == eng.num_blocks - 1
    assert (np.asarray(eng._refs) == 0).all()

    # byte-identical to an uncontended run of the same request (same seed)
    eng2 = make()
    v = eng2.submit(p, 40, eos_id=-1)
    eng2.poll()
    eng2.cancel(v)
    r2 = eng2.submit(p2, 12, eos_id=-1, sampling_seed=123)
    by_id = {c.request_id: c for c in eng2.run()}
    fresh2 = make()
    f2 = fresh2.submit(p2, 12, eos_id=-1, sampling_seed=123)
    fref = {c.request_id: c for c in fresh2.run()}
    np.testing.assert_array_equal(by_id[r2].tokens, fref[f2].tokens)
