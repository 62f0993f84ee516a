"""Serving at the reference's context limit (VERDICT r4 missing #2).

The reference serves ``max_model_len 3072`` through vLLM
(/root/reference/tts/training/rlhf/run_rlhf_combine.sh:60,
tools/serving/inference.py:94). These tests pin the engine's correctness
PAST 2048 slots — generations that cross the 2048 boundary through the
staged-dispatch ladder must match the one-shot generate program token for
token (the TPU throughput row lives in BENCHMARKS.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_max_tpu.inference.engine import InferenceEngine
from tts_max_tpu.inference.generate import make_generate_fn
from tts_max_tpu.models import llama
from tts_max_tpu.ops.sampling import SamplingParams


def _greedy_sp():
    return SamplingParams(temperature=0.0, repetition_penalty=1.0,
                          frequency_penalty=0.0)


def test_engine_crosses_2048_matches_generate():
    """max_len=3072 engine: a generation crossing 2048 slots (prompt 64 +
    budget 2200) must match the jitted generate path exactly; the staged
    ladder must actually have dispatched above the 2048 stage."""
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=64, max_seq_len=3072),
        dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    prompt = np.asarray(
        np.random.default_rng(0).integers(3, 60, 64), np.int32
    )
    budget = 2200

    sp = _greedy_sp()
    gen = make_generate_fn(cfg, sp, max_new_tokens=budget, eos_id=-1,
                           cache_len=3072)
    ref = gen(params, jnp.asarray(prompt)[None], jnp.asarray([64]),
              jax.random.PRNGKey(1))
    ref_toks = np.asarray(ref.tokens)[0, : int(ref.num_generated[0])]

    eng = InferenceEngine(
        params, cfg, max_batch=1, max_len=3072, sp=sp,
        steps_per_dispatch=64, min_stage=1024,
    )
    [comp] = eng.generate_all([prompt], max_new_tokens=budget, eos_id=-1)
    np.testing.assert_array_equal(comp.tokens, ref_toks)
    # the ladder dispatched at stages above 2048 (2560 and/or full 3072)
    deep = [s for s in eng._stage_counts
            if s is None or (isinstance(s, int) and s > 2048)]
    assert deep, dict(eng._stage_counts)
    assert len(comp.tokens) == budget


def test_engine_3072_budget_1792_reference_shape():
    """The reference production shape: max_model_len 3072 with the
    inference cap of 1792 new tokens (inferencing.py:21) and a long voice
    prompt — mixed with a short request to exercise staged growth, int8 KV
    on (the serving default at long context)."""
    cfg = dataclasses.replace(
        llama.tiny_config(vocab_size=64, max_seq_len=3072),
        dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    long_prompt = rng.integers(3, 60, 1200).astype(np.int32)
    short_prompt = rng.integers(3, 60, 40).astype(np.int32)

    eng = InferenceEngine(
        params, cfg, max_batch=2, max_len=3072, sp=_greedy_sp(),
        steps_per_dispatch=64, min_stage=1024, quantized_kv=True,
    )
    out = eng.generate_all([long_prompt, short_prompt],
                           max_new_tokens=1792, eos_id=-1)
    assert len(out[0].tokens) == 1792
    assert len(out[1].tokens) == 1792
    solo = InferenceEngine(
        params, cfg, max_batch=1, max_len=3072, sp=_greedy_sp(),
        steps_per_dispatch=64, min_stage=1024, quantized_kv=True,
    )
    [ref] = solo.generate_all([long_prompt], max_new_tokens=1792, eos_id=-1)
    np.testing.assert_array_equal(out[0].tokens, ref.tokens)
