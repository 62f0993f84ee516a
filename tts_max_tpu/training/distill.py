"""Draft-model distillation — the recipe speculative decoding needs.

Speculative decoding (inference/speculative.py) is exact for ANY draft,
but pays off only when the draft's proposals are accepted often enough:
round-4 chip numbers put breakeven at ~2.6 accepted tokens/round (γ=3) for
a 4-layer draft at 1B serving shapes, and a random draft realizes ~1.0
(BENCHMARKS.md). This module provides the production path to such a draft:

- ``truncated_draft``: initialize the draft from the target's first N
  layers + shared embed/norm/head (the standard shallow-draft init).
- ``distill_loss`` / ``make_distill_step``: train the draft to match the
  TARGET's token distribution (forward KL, blockwise over the 193 856-token
  head so no [B, S, V] tensor ever materializes — the same chunking as
  train_step.chunked_causal_lm_loss) on the tts dataset the target serves.

The draft stays vocabulary-compatible by construction, which
speculative_generate requires.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from tts_max_tpu.models import llama


def truncated_draft(
    params: Any, cfg: llama.LlamaConfig, n_layers: int
) -> tuple[Any, llama.LlamaConfig]:
    """Draft init: the target's first ``n_layers`` stacked layers; embed,
    final norm, and head copied (trained independently from here on)."""
    if not 0 < n_layers <= cfg.n_layers:
        raise ValueError(f"n_layers {n_layers} not in (0, {cfg.n_layers}]")
    draft_cfg = dataclasses.replace(cfg, n_layers=n_layers)
    draft = dict(params)
    draft["layers"] = jax.tree.map(lambda x: x[:n_layers], params["layers"])
    # deep-copy every leaf: the draft trains (and its step DONATES its
    # buffers) while the frozen target keeps using the originals — shared
    # embed/head buffers would otherwise fail donation aliasing checks
    return jax.tree.map(jnp.copy, draft), draft_cfg


def distill_loss(
    draft_params,
    target_params,
    tokens: jnp.ndarray,  # [B, S] int32
    mask: jnp.ndarray,  # [B, S] bool — True on real (non-pad) positions
    *,
    draft_cfg: llama.LlamaConfig,
    target_cfg: llama.LlamaConfig,
    chunk_size: int = 256,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Mean forward KL( target || draft ) per real next-token position,
    computed blockwise over the vocabulary head."""
    th = llama.forward_hidden(target_params, target_cfg, tokens)[:, :-1]
    dh = llama.forward_hidden(draft_params, draft_cfg, tokens)[:, :-1]
    m = mask[:, 1:]
    b, n_t, _ = th.shape
    c = min(chunk_size, n_t)
    n_chunks = -(-n_t // c)
    pad = n_chunks * c - n_t
    if pad:
        th = jnp.pad(th, ((0, 0), (0, pad), (0, 0)))
        dh = jnp.pad(dh, ((0, 0), (0, pad), (0, 0)))
        m = jnp.pad(m, ((0, 0), (0, pad)))

    def split(x):
        return x.reshape(b, n_chunks, c, *x.shape[2:]).swapaxes(0, 1)

    def chunk_kl(thc, dhc, mc):
        tl = llama._logits(thc, target_params, target_cfg) / temperature
        dl = llama._logits(dhc, draft_params, draft_cfg) / temperature
        tlp = jax.nn.log_softmax(tl, axis=-1)
        dlp = jax.nn.log_softmax(dl, axis=-1)
        kl = jnp.sum(jnp.exp(tlp) * (tlp - dlp), axis=-1)  # [B, C]
        return jnp.where(mc, kl, 0.0).sum()

    chunk_kl = jax.checkpoint(chunk_kl, prevent_cse=False)

    def body(acc, xs):
        return acc + chunk_kl(*xs), None

    total, _ = jax.lax.scan(
        body, jnp.zeros((), jnp.float32), (split(th), split(dh), split(m))
    )
    return total / jnp.maximum(m.sum(), 1)


def make_distill_step(draft_cfg, target_cfg, tx, chunk_size: int = 256,
                      grad_clip: float = 1.0, temperature: float = 1.0):
    """One jitted distillation step: KL grads w.r.t. the DRAFT only (the
    target rides along as a frozen operand)."""

    def step(draft_params, target_params, opt_state, tokens, mask):
        loss, grads = jax.value_and_grad(distill_loss)(
            draft_params, target_params, tokens, mask,
            draft_cfg=draft_cfg, target_cfg=target_cfg,
            chunk_size=chunk_size, temperature=temperature,
        )
        gnorm = optax.global_norm(grads)
        scale = jnp.where(
            jnp.isfinite(gnorm) & (gnorm > grad_clip), grad_clip / gnorm, 1.0
        )
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, draft_params)
        draft_params = optax.apply_updates(draft_params, updates)
        return draft_params, opt_state, loss, gnorm

    return jax.jit(step, donate_argnums=(0, 2))
