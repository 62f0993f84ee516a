"""Optimizer and LR schedules.

The reference's fused-CUDA AdamW (optimization.py:55-67) maps to optax.adamw —
XLA fuses the update; the cosine-with-warmup schedule reproduces
CosineLrScheduler exactly (optimization.py:25-52): linear warmup 0→peak,
cosine decay peak→peak/10, constant peak/10 afterwards.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_warmup_schedule(
    learning_rate: float, warmup_steps: int, lr_decay_steps: int
) -> optax.Schedule:
    if lr_decay_steps <= warmup_steps:
        raise ValueError("|lr_decay_steps| must be greater than |warmup_steps|.")
    peak = learning_rate
    start = learning_rate / 10.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = peak * step / max(1, warmup_steps)
        ratio = jnp.clip(
            (step - warmup_steps) / (lr_decay_steps - warmup_steps), 0.0, 1.0
        )
        coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * ratio))
        decay = start + coeff * (peak - start)
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def constant_schedule(learning_rate: float) -> optax.Schedule:
    return lambda step: jnp.asarray(learning_rate, jnp.float32)


def create_optimizer(
    learning_rate,
    betas: tuple[float, float] = (0.9, 0.95),
    weight_decay: float = 0.1,
    gradient_clip_value: float | None = None,
    mu_dtype: str | None = None,
) -> optax.GradientTransformation:
    """AdamW matching torch semantics (decay applied to every parameter, as
    the reference passes all model.parameters()). ``learning_rate`` may be a
    schedule. Clipping is handled in the train step (non-finite guard), not
    here, unless requested. ``mu_dtype="bf16"`` stores the first moment in
    bf16 (with bf16 params this is the single-chip 1B memory recipe);
    "fp32" pins fp32 moments even for bf16 params; None inherits the param
    dtype (optax default)."""
    tx = optax.adamw(
        learning_rate=learning_rate,
        b1=betas[0],
        b2=betas[1],
        eps=1e-8,
        weight_decay=weight_decay,
        mu_dtype={"bf16": jnp.bfloat16, "fp32": jnp.float32, None: None}[
            mu_dtype
        ],
    )
    if gradient_clip_value:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_value), tx)
    return tx
