"""Speculative decoding — draft/verify generation, exact w.r.t. the target.

A perf feature beyond the reference (its vLLM serving path has no
speculation; reference inferencing.py:66-107): a small DRAFT SpeechLM
proposes ``gamma`` tokens autoregressively, the TARGET model scores the
whole window in ONE ``decode_window`` forward (weights + KV read once per
gamma+1 tokens — the entire win on a bandwidth-bound chip), and standard
rejection sampling (Leviathan et al., arXiv 2211.17192) keeps the output
distribution EXACTLY the target's sampling distribution:

- candidate d_j is accepted with prob min(1, p_j(d_j) / q_j(d_j));
- the first rejection resamples from normalize(max(p_j - q_j, 0));
- if all gamma candidates are accepted, a bonus token is sampled from the
  target's distribution at the next position.

p/q are the POST-penalty/temperature/top-k/top-p distributions
(ops/sampling.sampling_distribution), with the count state replayed
identically on both sides, so repetition/frequency penalties stay exact.
Greedy (temperature=0) degenerates to exact prefix matching.

Cache bookkeeping (static shapes; every round is one while_loop iteration):
the draft re-processes the previous round's last accepted token before
drafting (its K/V may be missing after an all-accept round — rewriting an
existing row is idempotent), and rows past each sequence's committed length
are garbage that later rounds overwrite (attention masks by position).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tts_max_tpu.inference.generate import GenerateResult
from tts_max_tpu.models import llama
from tts_max_tpu.ops import sampling
from tts_max_tpu.ops.sampling import SamplingParams


def speculative_generate(
    target_params,
    target_cfg: llama.LlamaConfig,
    draft_params,
    draft_cfg: llama.LlamaConfig,
    prompt_tokens: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    rng: jax.Array,
    *,
    sp: SamplingParams,
    max_new_tokens: int,
    eos_id: int,
    gamma: int = 4,
    pad_id: int = 0,
    cache_len: int | None = None,
    quantized_kv: bool = False,
    vocab_window: tuple[int, int] | None = None,
) -> GenerateResult:
    """prompt_tokens: right-padded [B, S]. Returns generated tokens whose
    distribution equals plain ``generate`` on the target model. ``steps``
    reports verify rounds executed (tokens/round ≈ the speedup).

    ``vocab_window=(lo, size)``: both models' sampling is constrained to the
    window (inference/generate.py semantics); the [B, gamma+1, V] p/q
    tensors and both LM-head reads shrink to window size. Token variables
    below then live in window space; ``+ lo`` converts at the model-input /
    output-emission boundaries (lo == 0 unconstrained).
    """
    if target_cfg.vocab_size != draft_cfg.vocab_size:
        raise ValueError("draft and target must share the vocabulary")
    from tts_max_tpu.models.quantization import unpack_packed_params

    target_params = unpack_packed_params(target_params)
    draft_params = unpack_packed_params(draft_params)
    b, s = prompt_tokens.shape
    lo, v = vocab_window if vocab_window else (0, target_cfg.vocab_size)
    eos_w = eos_id - lo  # never matches a window id when eos is outside
    t_head = (
        llama.slice_logits_head(target_params, target_cfg, lo, v)
        if vocab_window else None
    )
    d_head = (
        llama.slice_logits_head(draft_params, draft_cfg, lo, v)
        if vocab_window else None
    )
    cache_len = cache_len or (s + max_new_tokens + gamma + 1)
    if cache_len < s + max_new_tokens + gamma + 1:
        raise ValueError("cache_len too small for prompt + budget + gamma")

    tgt_cache = llama.init_kv_cache(target_cfg, b, cache_len,
                                    quantized=quantized_kv)
    drf_cache = llama.init_kv_cache(draft_cfg, b, cache_len,
                                    quantized=quantized_kv)
    t_logits, tgt_cache = llama.prefill(
        target_params, target_cfg, prompt_tokens, prompt_lengths, tgt_cache,
        logits_head=t_head,
    )
    _, drf_cache = llama.prefill(
        draft_params, draft_cfg, prompt_tokens, prompt_lengths, drf_cache,
        logits_head=d_head,
    )
    prompt_mask = jnp.arange(s)[None, :] < prompt_lengths[:, None]
    if vocab_window:
        token_counts = sampling.counts_from_tokens_windowed(
            prompt_tokens, prompt_mask, vocab_window
        )
    else:
        token_counts = sampling.counts_from_tokens(
            prompt_tokens, prompt_mask, v
        )
    gen_counts = jnp.zeros_like(token_counts)

    rng, k0 = jax.random.split(rng)
    tok = sampling.sample_token(k0, t_logits, sp, token_counts, gen_counts)
    tok = tok.astype(jnp.int32)
    bi = jnp.arange(b)
    token_counts = token_counts.at[bi, tok].add(1)
    gen_counts = gen_counts.at[bi, tok].add(1)
    out = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    out = out.at[:, 0].set(tok + lo)
    n_gen = jnp.ones((b,), jnp.int32)
    done = (tok == eos_w) | (max_new_tokens <= 1)
    tail0 = jnp.take_along_axis(
        prompt_tokens, (prompt_lengths - 1)[:, None], axis=1
    )[:, 0].astype(jnp.int32)
    lengths = prompt_lengths.astype(jnp.int32)

    def round_body(state):
        (i, tgt_cache, drf_cache, lengths, tail0, tok, rng, token_counts,
         gen_counts, done, out, n_gen) = state

        # --- draft phase: re-process tail0 (idempotent rewrite), then draft
        _, drf_cache = llama.decode_step(
            draft_params, draft_cfg, drf_cache, tail0, lengths - 1
        )
        cands = []
        cnt_t, cnt_g = token_counts, gen_counts
        cur = tok
        qs = []
        for j in range(gamma):
            lg, drf_cache = llama.decode_step(
                draft_params, draft_cfg, drf_cache, cur + lo, lengths + j,
                logits_head=d_head,
            )
            al = sampling.adjusted_logits(lg, sp, cnt_t, cnt_g)
            if sp.temperature <= 0.0:
                q = jax.nn.one_hot(jnp.argmax(al, -1), v, dtype=jnp.float32)
                d = jnp.argmax(al, -1).astype(jnp.int32)
            else:
                q = jax.nn.softmax(al, axis=-1)
                rng, k = jax.random.split(rng)
                d = jax.random.categorical(k, al, axis=-1).astype(jnp.int32)
            cnt_t = cnt_t.at[bi, d].add(1)
            cnt_g = cnt_g.at[bi, d].add(1)
            cands.append(d)
            qs.append(q)
            cur = d
        cand = jnp.stack(cands, axis=1)  # [B, gamma]
        q_arr = jnp.stack(qs, axis=1)  # [B, gamma, V]

        # --- verify: one target forward over [tok, d_1..d_gamma]
        window = jnp.concatenate([tok[:, None], cand], axis=1)  # [B, gamma+1]
        t_logits, tgt_cache = llama.decode_window(
            target_params, target_cfg, tgt_cache, window + lo, lengths,
            logits_head=t_head,
        )
        cnt_t, cnt_g = token_counts, gen_counts
        ps = []
        for j in range(gamma + 1):
            ps.append(
                sampling.sampling_distribution(
                    t_logits[:, j], sp, cnt_t, cnt_g
                )
            )
            if j < gamma:
                cnt_t = cnt_t.at[bi, cand[:, j]].add(1)
                cnt_g = cnt_g.at[bi, cand[:, j]].add(1)
        p_arr = jnp.stack(ps, axis=1)  # [B, gamma+1, V]

        # --- accept/reject
        p_at_d = jnp.take_along_axis(
            p_arr[:, :gamma], cand[..., None], axis=-1
        )[..., 0]  # [B, gamma]
        q_at_d = jnp.take_along_axis(q_arr, cand[..., None], axis=-1)[..., 0]
        rng, ku = jax.random.split(rng)
        u = jax.random.uniform(ku, (b, gamma))
        # strict: P(u < p/q) = min(1, p/q) with u ~ U[0,1); '<=' would
        # wrongly accept p=0 candidates when u draws exactly 0
        accept = u * jnp.maximum(q_at_d, 1e-30) < p_at_d
        prefix = jnp.cumprod(accept.astype(jnp.int32), axis=1)
        n_acc = jnp.sum(prefix, axis=1)  # [B] in [0, gamma]

        # --- resample / bonus token from index n_acc
        p_sel = jnp.take_along_axis(
            p_arr, n_acc[:, None, None], axis=1
        )[:, 0]  # [B, V]
        q_idx = jnp.minimum(n_acc, gamma - 1)
        q_sel = jnp.take_along_axis(q_arr, q_idx[:, None, None], axis=1)[:, 0]
        q_sel = jnp.where((n_acc < gamma)[:, None], q_sel, 0.0)
        resid = jnp.maximum(p_sel - q_sel, 0.0)
        z = jnp.sum(resid, axis=-1, keepdims=True)
        resid = jnp.where(z > 0, resid / jnp.maximum(z, 1e-30), p_sel)
        rng, kt = jax.random.split(rng)
        t_star = jax.random.categorical(
            kt, jnp.log(resid + 1e-30), axis=-1
        ).astype(jnp.int32)

        # --- emit [d_1..d_{n_acc}, t_star], truncated at EOS / budget / done
        j_idx = jnp.arange(gamma + 1)[None, :]
        cand_pad = jnp.concatenate([cand, cand[:, -1:]], axis=1)
        vals = jnp.where(
            j_idx < n_acc[:, None], cand_pad,
            jnp.where(j_idx == n_acc[:, None], t_star[:, None], pad_id),
        ).astype(jnp.int32)
        valid = j_idx <= n_acc[:, None]
        is_eos = vals == eos_w
        eos_before = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos > 0
        valid &= ~eos_before
        valid &= ~done[:, None]
        valid &= n_gen[:, None] + j_idx < max_new_tokens
        positions = jnp.where(valid, n_gen[:, None] + j_idx, max_new_tokens)
        out = out.at[bi[:, None], positions].set(
            jnp.where(valid, vals + lo, pad_id), mode="drop"
        )
        n_emit = jnp.sum(valid.astype(jnp.int32), axis=1)
        token_counts = token_counts.at[
            jnp.repeat(bi, gamma + 1), vals.reshape(-1)
        ].add(valid.reshape(-1).astype(jnp.int32))
        gen_counts = gen_counts.at[
            jnp.repeat(bi, gamma + 1), vals.reshape(-1)
        ].add(valid.reshape(-1).astype(jnp.int32))
        n_gen = n_gen + n_emit
        newly_done = jnp.any(valid & is_eos, axis=1) | (
            n_gen >= max_new_tokens
        )

        # --- advance committed state (frozen for already-done sequences)
        adv = ~done
        lengths = jnp.where(adv, lengths + 1 + n_acc, lengths)
        last_cand = jnp.take_along_axis(
            cand_pad, jnp.maximum(n_acc - 1, 0)[:, None], axis=1
        )[:, 0]
        new_tail0 = jnp.where(n_acc == 0, tok, last_cand) + lo
        tail0 = jnp.where(adv, new_tail0, tail0)
        tok = jnp.where(adv, t_star, tok)
        done = done | newly_done
        return (i + 1, tgt_cache, drf_cache, lengths, tail0, tok, rng,
                token_counts, gen_counts, done, out, n_gen)

    def cond(state):
        i, done = state[0], state[9]
        return (i < max_new_tokens) & ~jnp.all(done)

    state = (jnp.zeros((), jnp.int32), tgt_cache, drf_cache, lengths, tail0,
             tok, rng, token_counts, gen_counts, done, out, n_gen)
    state = jax.lax.while_loop(cond, round_body, state)
    return GenerateResult(tokens=state[10], num_generated=state[11],
                          steps=state[0])


def make_speculative_generate_fn(
    target_cfg, draft_cfg, sp, max_new_tokens, eos_id, gamma=4, pad_id=0,
    cache_len=None, quantized_kv=False, vocab_window=None,
):
    def fn(target_params, draft_params, prompt_tokens, prompt_lengths, rng):
        return speculative_generate(
            target_params, target_cfg, draft_params, draft_cfg,
            prompt_tokens, prompt_lengths, rng, sp=sp,
            max_new_tokens=max_new_tokens, eos_id=eos_id, gamma=gamma,
            pad_id=pad_id, cache_len=cache_len, quantized_kv=quantized_kv,
            vocab_window=vocab_window,
        )

    return jax.jit(fn)
