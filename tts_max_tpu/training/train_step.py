"""Jitted, GSPMD-sharded SpeechLM training step.

Replaces the reference micro-batch loop body
(/root/reference/tts/training/training_loop.py:102-169): one jitted call
performs all gradient-accumulation micro-steps (lax.scan), global-norm
clipping with a non-finite guard, and the AdamW update. Collectives
(grad allreduce ≡ DDP, sharded optimizer state ≡ ZeRO) are inserted by XLA
from the NamedSharding annotations — there is no no_backward_sync / fabric
machinery to port.

The non-finite guard mirrors ``error_if_nonfinite=True``
(training_loop.py:163-165): JAX cannot raise inside jit, so a non-finite
global grad norm SKIPS the update and reports ``nonfinite=1`` for the host
loop to act on (checkpoint + stop, same contract).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from tts_max_tpu.core.constants import LOSS_IGNORE_TOKEN_ID
from tts_max_tpu.models import llama
from tts_max_tpu.parallel.sharding import batch_sharding, params_shardings


class StepMetrics(NamedTuple):
    loss: jnp.ndarray  # mean loss over micro-steps
    grad_norm: jnp.ndarray
    nonfinite: jnp.ndarray  # 1.0 if the update was skipped
    tokens: jnp.ndarray  # number of loss tokens
    # NOTE: per-step grad/param abs-max "health stats" were removed in
    # round 5 — nothing consumed them, and the r4 xprof attribution
    # (tools/xplane_summary.py) measured the per-leaf max/stack chains at
    # ~5-9% of every step. The reference computes health stats only at
    # eval steps (evaluation.py:11-73), which training/evaluation.py
    # mirrors behind collect_health_stats.


def causal_lm_loss(
    logits: jnp.ndarray, labels: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """HF-convention shifted cross entropy: logits[:, :-1] predict labels[:, 1:];
    -100 positions are ignored; mean over valid tokens."""
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    valid = targets != LOSS_IGNORE_TOKEN_ID
    safe_targets = jnp.where(valid, targets, 0)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(valid.sum(), 1)
    return nll.sum() / n, valid.sum()


def chunked_causal_lm_loss(
    params,
    cfg: llama.LlamaConfig,
    hidden: jnp.ndarray,
    labels: jnp.ndarray,
    chunk_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Blockwise cross entropy over the 193856-token head.

    The naive loss materializes [B, S, V] fp32 logprobs (≈4.8 GB at batch
    2×2048) — that allocation, not the layer stack, is what forced full-layer
    remat and capped single-chip MFU. Here the sequence is scanned in
    ``chunk_size``-token chunks; each chunk computes its logits [B, C, V],
    reduces them to fp32 ``logsumexp - target_logit`` immediately, and the
    chunk body is ``jax.checkpoint``-ed so the backward pass recomputes chunk
    logits instead of storing them. Peak extra memory: one [B, C, V] chunk.

    Numerically identical to :func:`causal_lm_loss` (log_softmax gather ==
    lse - target on the same fp32 logits); parity-tested in
    tests/test_train_step.py.
    """
    h = hidden[:, :-1]
    t = labels[:, 1:]
    B, T, D = h.shape
    C = min(chunk_size, T)
    n_chunks = -(-T // C)
    pad = n_chunks * C - T
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        t = jnp.pad(t, ((0, 0), (0, pad)), constant_values=LOSS_IGNORE_TOKEN_ID)
    h = h.reshape(B, n_chunks, C, D).transpose(1, 0, 2, 3)  # [n, B, C, D]
    t = t.reshape(B, n_chunks, C).transpose(1, 0, 2)  # [n, B, C]

    def chunk_nll(hc, tc):
        logits = llama._logits(hc, params, cfg)  # fp32 [B, C, V]
        valid = tc != LOSS_IGNORE_TOKEN_ID
        safe = jnp.where(valid, tc, 0)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, lse - tgt, 0.0)
        return nll.sum(), valid.sum()

    chunk_nll = jax.checkpoint(chunk_nll, prevent_cse=False)

    def body(carry, xs):
        nll_sum, n_valid = carry
        s, k = chunk_nll(*xs)
        return (nll_sum + s, n_valid + k), None

    (nll_sum, n_valid), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (h, t)
    )
    return nll_sum / jnp.maximum(n_valid, 1), n_valid


def loss_fn(
    params, cfg: llama.LlamaConfig, batch, loss_chunk_size: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    if loss_chunk_size > 0:
        hidden = llama.forward_hidden(params, cfg, batch["input_ids"])
        return chunked_causal_lm_loss(
            params, cfg, hidden, batch["labels"], loss_chunk_size
        )
    logits = llama.forward(params, cfg, batch["input_ids"])
    return causal_lm_loss(logits, batch["labels"])


def train_step(
    params,
    opt_state,
    batch,
    *,
    cfg: llama.LlamaConfig,
    tx: optax.GradientTransformation,
    gradient_clip_value: float = 1.0,
    loss_chunk_size: int = 0,
):
    """One optimizer step over a macro-batch.

    batch: {"input_ids": [A, B, L], "labels": [A, B, L]} — A = gradient
    accumulation micro-steps (A=1 for no accumulation).
    """

    accum = batch["input_ids"].shape[0]
    if accum == 1:
        # no accumulation: skip the scan and its zero-initialized grad carry
        (loss, tok_sum), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, jax.tree_util.tree_map(lambda x: x[0], batch),
            loss_chunk_size,
        )
    else:

        def micro(carry, mb):
            grad_sum, loss_sum, tok_sum = carry
            (loss, toks), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, cfg, mb, loss_chunk_size
            )
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, g)
            return (grad_sum, loss_sum + loss, tok_sum + toks), None

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        (grads, loss_sum, tok_sum), _ = jax.lax.scan(
            micro, (zero_grads, jnp.zeros(()), jnp.zeros((), jnp.int32)), batch
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        loss = loss_sum / accum

    gnorm = optax.global_norm(grads)
    finite = jnp.isfinite(gnorm)
    clip_scale = jnp.where(
        finite & (gnorm > gradient_clip_value), gradient_clip_value / gnorm, 1.0
    )
    # Non-finite step: sanitize grads to zero and zero the final updates so
    # params stay EXACTLY unchanged (the host loop then checkpoints and
    # stops, reference contract training_loop.py:268-271). Masking the
    # grad/update trees instead of cloning params+opt_state halves peak
    # memory — the moments decay one step, which is irrelevant post-stop.
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g * clip_scale, jnp.zeros_like(g)), grads
    )

    updates, new_opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(
        lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates
    )
    new_params = optax.apply_updates(params, updates)
    metrics = StepMetrics(
        loss=loss,
        grad_norm=gnorm,
        nonfinite=(~finite).astype(jnp.float32),
        tokens=tok_sum,
    )
    return new_params, new_opt_state, metrics


def eval_step(params, batch, *, cfg: llama.LlamaConfig, loss_chunk_size: int = 0):
    """Loss on one eval micro-batch [B, L]."""
    loss, toks = loss_fn(params, cfg, batch, loss_chunk_size)
    return loss, toks


def make_train_step(mesh, cfg: llama.LlamaConfig, tx, params,
                    gradient_clip_value: float = 1.0,
                    loss_chunk_size: int = 0):
    """Build the jitted sharded step: params/opt-state shardings from the
    partition rules, batch over (data, fsdp); donated for in-place update."""
    p_shardings = params_shardings(params, mesh)
    opt_shardings = _opt_state_shardings(tx, params, p_shardings, mesh)
    batch_shardings = {"input_ids": data_sh_axis1(mesh), "labels": data_sh_axis1(mesh)}

    step = functools.partial(
        train_step, cfg=cfg, tx=tx, gradient_clip_value=gradient_clip_value,
        loss_chunk_size=loss_chunk_size,
    )
    return jax.jit(
        step,
        in_shardings=(p_shardings, opt_shardings, batch_shardings),
        out_shardings=(p_shardings, opt_shardings, None),
        donate_argnums=(0, 1),
    )


def data_sh_axis1(mesh):
    """Macro-batches are [A, B, L]: shard the *second* axis (B) over
    (data, fsdp); A (accumulation) stays unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tts_max_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS

    return NamedSharding(mesh, P(None, (DATA_AXIS, FSDP_AXIS)))


def _opt_state_shardings(tx, params, p_shardings, mesh):
    """Shard optimizer-state leaves like their matching parameter (ZeRO): any
    leaf with a param-shaped counterpart inherits the param sharding;
    scalars (step counts) replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    shapes = jax.eval_shape(tx.init, params)
    flat_params, _ = jax.tree_util.tree_flatten(params)
    flat_shard, _ = jax.tree_util.tree_flatten(p_shardings)
    by_shape = {}
    for p, s in zip(flat_params, flat_shard):
        by_shape.setdefault(tuple(p.shape), s)

    def leaf_sharding(leaf):
        s = by_shape.get(tuple(leaf.shape))
        return s if s is not None else NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, shapes)


def make_eval_step(mesh, cfg: llama.LlamaConfig, params, loss_chunk_size: int = 0):
    p_shardings = params_shardings(params, mesh)
    data_sh = batch_sharding(mesh)
    return jax.jit(
        functools.partial(eval_step, cfg=cfg, loss_chunk_size=loss_chunk_size),
        in_shardings=(p_shardings, {"input_ids": data_sh, "labels": data_sh}),
    )
