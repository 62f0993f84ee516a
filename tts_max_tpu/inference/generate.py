"""KV-cached autoregressive generation — jitted while_loop decode.

Replaces HF ``model.generate`` / vLLM sampling (reference
inferencing.py:66-107) with a TPU-native design: prefill + a
``lax.while_loop`` decode loop that runs entirely on-device (no per-token
host round-trip), with on-device sampling (temperature / top-k / top-p /
repetition / frequency penalties), per-sequence EOS early-exit, and static
shapes throughout.

Two dispatch shapes:

- ``generate`` / ``make_generate_fn``: the whole loop (prefill + all decode
  stages) traces into ONE XLA program.
- ``make_host_staged_generate_fn``: one jitted program per cache stage,
  orchestrated from host (arrays never leave the device). Same arithmetic
  as ``staged=True``, but per-program run time stays bounded and stage
  programs are shared across calls with different prompt shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tts_max_tpu.models import llama
from tts_max_tpu.ops import sampling


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_new_tokens] generated ids (pad after EOS)
    num_generated: jnp.ndarray  # [B] tokens generated incl. EOS
    steps: jnp.ndarray  # scalar: decode iterations executed


def _stage_sizes(s: int, cache_len: int, staged: bool) -> list[int]:
    """Doubling cache sizes [first, 2*first, ..., cache_len] (or just
    [cache_len] unstaged). first covers the prompt plus one decode write."""
    if not staged:
        return [cache_len]
    first = min(cache_len, max(256, -(-(s + 1) // 128) * 128))
    sizes = [first]
    while sizes[-1] < cache_len:
        sizes.append(min(cache_len, sizes[-1] * 2))
    return sizes


def _init_state(params, cfg, prompt_tokens, prompt_lengths, rng, *,
                max_new_tokens, pad_id, first_size, quantized_kv,
                vocab_window=None):
    """Prefill into a first-stage cache and build the decode-loop state.

    With ``vocab_window=(lo, size)`` the logits and penalty-count buffers
    live in window space [B, size] (tokens stored in ``out`` stay global).
    """
    from tts_max_tpu.models.quantization import unpack_packed_params

    b, s = prompt_tokens.shape
    params = unpack_packed_params(params)  # int4: one in-program S4 copy
    head = (
        llama.slice_logits_head(params, cfg, *vocab_window)
        if vocab_window else None
    )
    cache = llama.init_kv_cache(cfg, b, first_size, quantized=quantized_kv)
    logits, cache = llama.prefill(
        params, cfg, prompt_tokens, prompt_lengths, cache, logits_head=head
    )
    prompt_mask = jnp.arange(s)[None, :] < prompt_lengths[:, None]
    if vocab_window:
        token_counts = sampling.counts_from_tokens_windowed(
            prompt_tokens, prompt_mask, vocab_window
        )
    else:
        token_counts = sampling.counts_from_tokens(
            prompt_tokens, prompt_mask, cfg.vocab_size
        )
    return (
        jnp.zeros((), jnp.int32),  # i
        cache,
        logits,
        prompt_lengths,  # lengths
        rng,
        token_counts,
        jnp.zeros_like(token_counts),  # gen_counts
        jnp.zeros((b,), dtype=bool),  # done
        jnp.full((b, max_new_tokens), pad_id, dtype=jnp.int32),  # out
        jnp.zeros((b,), dtype=jnp.int32),  # n_gen
    )


def _make_body(params, cfg, sp, eos_id, pad_id, b, vocab_window=None,
               min_new_tokens=0):
    lo = vocab_window[0] if vocab_window else 0
    head = (
        llama.slice_logits_head(params, cfg, *vocab_window)
        if vocab_window else None
    )
    eos_w = eos_id - lo  # window-space EOS column (may be out of range)
    block_eos = (
        min_new_tokens > 0
        and 0 <= eos_w < (vocab_window[1] if vocab_window else cfg.vocab_size)
    )

    def body(state):
        i, cache, logits, lengths, rng, token_counts, gen_counts, done, out, n_gen = state
        rng, k = jax.random.split(rng)
        if block_eos:
            # vLLM min_tokens semantics (reference InferenceSettings
            # min_tokens): EOS is banned while fewer than min_new_tokens
            # have been generated
            logits = logits.at[:, eos_w].set(
                jnp.where(n_gen < min_new_tokens, -jnp.inf, logits[:, eos_w])
            )
        # sampling (and the count buffers) run in window space; emitted ids
        # are global (window id + lo)
        tok_w = sampling.sample_token(k, logits, sp, token_counts, gen_counts)
        tok = jnp.where(done, pad_id, tok_w + lo).astype(jnp.int32)
        newly_done = tok == eos_id
        out = out.at[:, i].set(jnp.where(done, pad_id, tok))
        n_gen = n_gen + (~done).astype(jnp.int32)
        inc = (~done).astype(jnp.int32)
        idx = jnp.where(done, 0, tok_w)  # in-range scatter index; inc=0 when done
        token_counts = token_counts.at[jnp.arange(b), idx].add(inc)
        gen_counts = gen_counts.at[jnp.arange(b), idx].add(inc)
        logits, cache = llama.decode_step(
            params, cfg, cache, tok, lengths, logits_head=head
        )
        lengths = lengths + inc
        done = done | newly_done
        return (i + 1, cache, logits, lengths, rng, token_counts, gen_counts,
                done, out, n_gen)

    return body


def _make_cond(limit):
    def cond(state):
        i, _, _, _, _, _, _, done, _, _ = state
        return (i < limit) & ~jnp.all(done)

    return cond


def _run_stage(params, state, *, cfg, sp, eos_id, pad_id, size, limit,
               vocab_window=None, min_new_tokens=0):
    """Grow the cache to ``size`` and decode until step ``limit`` (or EOS).

    A stage's decode_step writes at index <= s-1 + i, so the i bound for a
    size-``size`` cache is size - s (the caller passes the min with
    max_new_tokens). ``limit`` may be a traced scalar (host-staged path).
    """
    from tts_max_tpu.models.quantization import unpack_packed_params

    b = state[3].shape[0]
    params = unpack_packed_params(params)  # int4: one S4 copy per stage
    state = (state[0], llama.grow_cache(state[1], size)) + state[2:]
    body = _make_body(params, cfg, sp, eos_id, pad_id, b, vocab_window,
                      min_new_tokens)
    return jax.lax.while_loop(_make_cond(limit), body, state)


def _run_stage_delta(params, state, *, cfg, sp, eos_id, pad_id, size, limit,
                     delta_k, vocab_window=None, min_new_tokens=0):
    """Delta-KV form of a decode stage: the cache is written only by an
    in-program commit every ``delta_k`` steps (plus one final partial
    commit), not per step.

    Round-4 ablation: the conventional per-step K/V scatter makes XLA copy
    the whole loop-carried cache every iteration (2.5x the attention read
    at 768 slots; ~17 of 20.6 ms/step at a 1792-slot cache). Here each
    step's rows land in a [L, B, delta_k, Hkv, D] buffer, attention runs
    jointly over cache[:base] + the masked delta
    (llama.decode_step_delta), and the cache is committed once per window.
    Structure matters on this platform: a single loop with a lax.cond
    flush STILL copies the cache every step (the identity branch writes
    the cond's output buffer — measured, first attempt), so the windows
    are a NESTED loop — the inner bounded loop carries only the delta +
    small state (cache as a read-only closure operand), and the outer
    body commits unconditionally. Same softmax set as the conventional
    path (bitwise-different sum order; int8 caches attend the current
    window unquantized and quantize at commit).
    """
    from tts_max_tpu.models.quantization import unpack_packed_params

    b = state[3].shape[0]
    lo = vocab_window[0] if vocab_window else 0
    params = unpack_packed_params(params)
    state = (state[0], llama.grow_cache(state[1], size)) + state[2:]
    head = (
        llama.slice_logits_head(params, cfg, *vocab_window)
        if vocab_window else None
    )
    eos_w = eos_id - lo
    block_eos = (
        min_new_tokens > 0
        and 0 <= eos_w < (vocab_window[1] if vocab_window else cfg.vocab_size)
    )
    (i0, cache, logits, lengths, rng, token_counts, gen_counts, done, out,
     n_gen) = state

    def make_inner_body(cache):  # cache: read-only loop-invariant operand
        def inner_body(st):
            (i, j, delta, dmask, base, logits, lengths, rng,
             token_counts, gen_counts, done, out, n_gen) = st
            rng, k = jax.random.split(rng)
            if block_eos:
                logits = logits.at[:, eos_w].set(
                    jnp.where(n_gen < min_new_tokens, -jnp.inf,
                              logits[:, eos_w])
                )
            tok_w = sampling.sample_token(k, logits, sp, token_counts,
                                          gen_counts)
            tok = jnp.where(done, pad_id, tok_w + lo).astype(jnp.int32)
            newly_done = tok == eos_id
            out = out.at[:, i].set(jnp.where(done, pad_id, tok))
            n_gen = n_gen + (~done).astype(jnp.int32)
            inc = (~done).astype(jnp.int32)
            idx = jnp.where(done, 0, tok_w)
            token_counts = token_counts.at[jnp.arange(b), idx].add(inc)
            gen_counts = gen_counts.at[jnp.arange(b), idx].add(inc)
            dmask = dmask.at[:, j].set(~done)
            logits, delta = llama.decode_step_delta(
                params, cfg, cache, delta, tok,
                jnp.minimum(lengths, size - 1), base, dmask, j,
                logits_head=head,
            )
            lengths = lengths + inc
            done = done | newly_done
            return (i + 1, j + 1, delta, dmask, base, logits, lengths,
                    rng, token_counts, gen_counts, done, out, n_gen)

        return inner_body

    def inner_cond(st):
        i, j, done = st[0], st[1], st[10]
        return (i < limit) & (j < delta_k) & ~jnp.all(done)

    def outer_body(st):
        (i, cache, logits, lengths, rng, token_counts, gen_counts, done,
         out, n_gen) = st
        # fresh window: the inner loop's carry holds only the delta + small
        # state; the cache is a read-only operand of the inner body
        delta = llama.init_delta(cfg, b, delta_k)
        dmask = jnp.zeros((b, delta_k), dtype=bool)
        base = lengths
        ist = (i, jnp.zeros((), jnp.int32), delta, dmask, base,
               logits, lengths, rng, token_counts, gen_counts, done, out,
               n_gen)
        ist = jax.lax.while_loop(inner_cond, make_inner_body(cache), ist)
        (i, _, delta, _, base, logits, lengths, rng, token_counts,
         gen_counts, done, out, n_gen) = ist
        cache = llama.commit_delta(cache, delta, base)  # once per window
        return (i, cache, logits, lengths, rng, token_counts, gen_counts,
                done, out, n_gen)

    def outer_cond(st):
        return (st[0] < limit) & ~jnp.all(st[7])

    st = (i0, cache, logits, lengths, rng, token_counts, gen_counts, done,
          out, n_gen)
    return jax.lax.while_loop(outer_cond, outer_body, st)


def generate(
    params,
    cfg: llama.LlamaConfig,
    prompt_tokens: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    rng: jax.Array,
    *,
    sp: sampling.SamplingParams,
    max_new_tokens: int,
    eos_id: int,
    pad_id: int = 0,
    cache_len: int | None = None,
    quantized_kv: bool = False,
    staged: bool = False,
    vocab_window: tuple[int, int] | None = None,
    min_new_tokens: int = 0,
    delta_k: int | None = None,
) -> GenerateResult:
    """prompt_tokens: right-padded [B, S]; returns generated tokens only.

    ``vocab_window=(lo, size)`` constrains generation to the contiguous
    token-id window [lo, lo+size): logits are computed only over those
    output-head rows and sampling/penalties run in window space (emitted ids
    stay global). For TTS this is SpeechVocab.generation_window() — a
    speech-grammar guarantee AND a ~3x cut of the per-step LM-head +
    penalty-buffer HBM read at the 193856 vocab. ``eos_id`` must lie inside
    the window (or be unreachable, e.g. -1).

    The full loop (prefill + decode) traces into a single XLA program; wrap
    in jax.jit (static: cfg, sp, max_new_tokens, eos_id, pad_id, cache_len).
    ``quantized_kv`` stores the KV cache as per-token int8 (half the HBM
    traffic of bf16 in the bandwidth-bound decode loop; models/llama.py).
    ``staged`` decodes against a cache that starts small and doubles as it
    fills (one while_loop per stage, grow_cache between): every step reads a
    cache at most 2x its occupancy instead of the full-length padded buffer,
    which dominates HBM traffic for long generations (+48% at a 960-token
    cache, BENCHMARKS.md).
    """
    b, s = prompt_tokens.shape
    cache_len = cache_len or (s + max_new_tokens)
    if cache_len < s + max_new_tokens:
        raise ValueError("cache_len too small for prompt + max_new_tokens")

    sizes = _stage_sizes(s, cache_len, staged)
    state = _init_state(
        params, cfg, prompt_tokens, prompt_lengths, rng,
        max_new_tokens=max_new_tokens, pad_id=pad_id, first_size=sizes[0],
        quantized_kv=quantized_kv, vocab_window=vocab_window,
    )
    for size in sizes:
        if delta_k:
            state = _run_stage_delta(
                params, state, cfg=cfg, sp=sp, eos_id=eos_id, pad_id=pad_id,
                size=size, limit=min(max_new_tokens, size - s),
                delta_k=delta_k, vocab_window=vocab_window,
                min_new_tokens=min_new_tokens,
            )
        else:
            state = _run_stage(
                params, state, cfg=cfg, sp=sp, eos_id=eos_id, pad_id=pad_id,
                size=size, limit=min(max_new_tokens, size - s),
                vocab_window=vocab_window, min_new_tokens=min_new_tokens,
            )
    (steps, _, _, _, _, _, _, _, out, n_gen) = state
    return GenerateResult(tokens=out, num_generated=n_gen, steps=steps)


def make_generate_fn(cfg, sp, max_new_tokens, eos_id, pad_id=0, cache_len=None,
                     quantized_kv=False, staged=False, vocab_window=None,
                     min_new_tokens=0, delta_k=None):
    def fn(params, prompt_tokens, prompt_lengths, rng):
        return generate(
            params, cfg, prompt_tokens, prompt_lengths, rng,
            sp=sp, max_new_tokens=max_new_tokens, eos_id=eos_id,
            pad_id=pad_id, cache_len=cache_len, quantized_kv=quantized_kv,
            staged=staged, vocab_window=vocab_window,
            min_new_tokens=min_new_tokens, delta_k=delta_k,
        )

    return jax.jit(fn)


def make_host_staged_generate_fn(cfg, sp, max_new_tokens, eos_id, pad_id=0,
                                 cache_len=None, quantized_kv=False,
                                 max_steps_per_dispatch=512,
                                 vocab_window=None, min_new_tokens=0,
                                 delta_k=None):
    """Staged generation with one jitted program per cache size.

    Numerically identical to ``make_generate_fn(..., staged=True)`` but
    host-orchestrated: the stage step-limit is a traced scalar, so ONE
    compiled program per cache size is re-invoked with at most
    ``max_steps_per_dispatch`` decode steps per execution (device arrays are
    threaded through; only the step counter is fetched between dispatches).
    This bounds both compile-unit size and single-execution run time — long
    generations on this environment's relayed TPU require the latter (the
    relay drops executions running for roughly a minute) — while stage
    programs are shared across calls. Set ``max_steps_per_dispatch=None``
    for one dispatch per stage.

    ``delta_k`` (e.g. 64): use delta-KV stages (_run_stage_delta) — the
    cache is committed once per ``delta_k`` steps instead of written per
    step, removing the per-iteration full-cache copy XLA makes for the
    conventional scatter (round-4 ablation; the dominant cost at long
    caches). Same softmax set, bitwise-different sum order.
    """
    init = jax.jit(
        functools.partial(
            _wrapped_init, cfg=cfg, max_new_tokens=max_new_tokens,
            pad_id=pad_id, cache_len=cache_len, quantized_kv=quantized_kv,
            vocab_window=vocab_window,
        )
    )
    grow_jits: dict[int, callable] = {}
    stage_jits: dict[int, callable] = {}

    def fn(params, prompt_tokens, prompt_lengths, rng) -> GenerateResult:
        b, s = prompt_tokens.shape
        cl = cache_len or (s + max_new_tokens)
        if cl < s + max_new_tokens:
            raise ValueError("cache_len too small for prompt + max_new_tokens")
        state = init(params, prompt_tokens, prompt_lengths, rng)
        i = 0
        for size in _stage_sizes(s, cl, True):
            if size not in grow_jits:
                # donate: the pre-grow cache must not stay alive next to the
                # grown one (two near-full caches won't fit HBM at 8B scale)
                grow_jits[size] = jax.jit(
                    functools.partial(llama.grow_cache, new_len=size),
                    donate_argnums=(0,),
                )
            if size not in stage_jits:
                if delta_k:
                    stage_fn = functools.partial(
                        _run_stage_delta, cfg=cfg, sp=sp, eos_id=eos_id,
                        pad_id=pad_id, size=size, delta_k=delta_k,
                        vocab_window=vocab_window,
                        min_new_tokens=min_new_tokens,
                    )
                else:
                    stage_fn = functools.partial(
                        _run_stage, cfg=cfg, sp=sp, eos_id=eos_id,
                        pad_id=pad_id, size=size, vocab_window=vocab_window,
                        min_new_tokens=min_new_tokens,
                    )
                stage_jits[size] = jax.jit(
                    stage_fn,
                    donate_argnums=(1,),  # consume the input state in place
                )
            state = (state[0], grow_jits[size](state[1])) + state[2:]
            target = min(max_new_tokens, size - s)
            while i < target:
                limit = (target if max_steps_per_dispatch is None
                         else min(target, i + max_steps_per_dispatch))
                state = stage_jits[size](
                    params, state, limit=jnp.asarray(limit, jnp.int32)
                )
                prev, i = i, int(state[0])
                if i == prev:  # no progress: every sequence hit EOS
                    i = target
        (steps, _, _, _, _, _, _, _, out, n_gen) = state
        return GenerateResult(tokens=out, num_generated=n_gen, steps=steps)

    return fn


def _wrapped_init(params, prompt_tokens, prompt_lengths, rng, *, cfg,
                  max_new_tokens, pad_id, cache_len, quantized_kv,
                  vocab_window=None):
    s = prompt_tokens.shape[1]
    cl = cache_len or (s + max_new_tokens)
    return _init_state(
        params, cfg, prompt_tokens, prompt_lengths, rng,
        max_new_tokens=max_new_tokens, pad_id=pad_id,
        first_size=_stage_sizes(s, cl, True)[0], quantized_kv=quantized_kv,
        vocab_window=vocab_window,
    )
