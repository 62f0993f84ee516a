"""KV-cached autoregressive generation — one jitted program.

Replaces HF ``model.generate`` / vLLM sampling (reference
inferencing.py:66-107) with a TPU-native design: prefill + a
``lax.while_loop`` decode loop that runs entirely on-device (no per-token
host round-trip), with on-device sampling (temperature / top-k / top-p /
repetition / frequency penalties), per-sequence EOS early-exit, and static
shapes throughout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tts_max_tpu.models import llama
from tts_max_tpu.ops import sampling


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray  # [B, max_new_tokens] generated ids (pad after EOS)
    num_generated: jnp.ndarray  # [B] tokens generated incl. EOS
    steps: jnp.ndarray  # scalar: decode iterations executed


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
) -> GenerateResult:
    """prompt_tokens: right-padded [B, S]; returns generated tokens only.

    The full loop (prefill + decode) traces into a single XLA program; wrap
    in jax.jit (static: cfg, sp, max_new_tokens, eos_id, pad_id, cache_len).
    ``quantized_kv`` stores the KV cache as per-token int8 (half the HBM
    traffic of bf16 in the bandwidth-bound decode loop; models/llama.py).
    """
    b, s = prompt_tokens.shape
    cache_len = cache_len or (s + max_new_tokens)
    if cache_len < s + max_new_tokens:
        raise ValueError("cache_len too small for prompt + max_new_tokens")

    cache = llama.init_kv_cache(cfg, b, cache_len, quantized=quantized_kv)
    logits, cache = llama.prefill(params, cfg, prompt_tokens, prompt_lengths, cache)

    prompt_mask = (
        jnp.arange(s)[None, :] < prompt_lengths[:, None]
    )
    token_counts = sampling.counts_from_tokens(
        prompt_tokens, prompt_mask, cfg.vocab_size
    )
    gen_counts = jnp.zeros_like(token_counts)
    out = jnp.full((b, max_new_tokens), pad_id, dtype=jnp.int32)
    done = jnp.zeros((b,), dtype=bool)
    n_gen = jnp.zeros((b,), dtype=jnp.int32)

    def cond(state):
        i, _, _, _, _, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, cache, logits, lengths, rng, token_counts, gen_counts, done, out, n_gen = state
        rng, k = jax.random.split(rng)
        tok = sampling.sample_token(k, logits, sp, token_counts, gen_counts)
        tok = jnp.where(done, pad_id, tok).astype(jnp.int32)
        newly_done = tok == eos_id
        out = out.at[:, i].set(jnp.where(done, pad_id, tok))
        n_gen = n_gen + (~done).astype(jnp.int32)
        inc = (~done).astype(jnp.int32)
        token_counts = token_counts.at[jnp.arange(b), tok].add(inc)
        gen_counts = gen_counts.at[jnp.arange(b), tok].add(inc)
        logits, cache = llama.decode_step(params, cfg, cache, tok, lengths)
        lengths = lengths + inc
        done = done | newly_done
        return (i + 1, cache, logits, lengths, rng, token_counts, gen_counts,
                done, out, n_gen)

    state = (
        jnp.zeros((), jnp.int32),
        cache,
        logits,
        prompt_lengths,
        rng,
        token_counts,
        gen_counts,
        done,
        out,
        n_gen,
    )
    state = jax.lax.while_loop(cond, body, state)
    (steps, _, _, _, _, _, _, _, out, n_gen) = state
    return GenerateResult(tokens=out, num_generated=n_gen, steps=steps)


def make_generate_fn(cfg, sp, max_new_tokens, eos_id, pad_id=0, cache_len=None,
                     quantized_kv=False):
    def fn(params, prompt_tokens, prompt_lengths, rng):
        return generate(
            params, cfg, prompt_tokens, prompt_lengths, rng,
            sp=sp, max_new_tokens=max_new_tokens, eos_id=eos_id,
            pad_id=pad_id, cache_len=cache_len, quantized_kv=quantized_kv,
        )

    return jax.jit(fn)
