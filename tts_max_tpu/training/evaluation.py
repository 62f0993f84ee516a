"""Validation metrics: per-source eval loss + model-health statistics.

Reference parity (/root/reference/tts/training/evaluation.py:11-101): val
loss aggregated per data source, optional max/avg abs param stats. Cross-
process reduction happens via the statistics process-sum (psum of host
vectors) instead of fabric.all_reduce.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def compute_metrics(
    eval_step: Callable,
    params: Any,
    val_batches: Iterable[dict],
    prettify: Callable[[dict], dict],
    collect_health_stats: bool = False,
    reduce_fn=None,
) -> dict[str, float]:
    loss_sums: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for batch in val_batches:
        if not batch:
            continue
        sources = batch.get("source", ["default"] * len(batch["input_ids"]))
        loss, toks = eval_step(params, prettify(batch))
        loss = float(loss)
        loss_sums["total"] += loss
        counts["total"] += 1
        for s in set(sources):
            loss_sums[s] += loss
            counts[s] += 1

    keys = sorted(loss_sums)
    vals = np.array(
        [loss_sums[k] for k in keys] + [float(counts[k]) for k in keys]
    )
    if reduce_fn is not None:
        vals = np.asarray(reduce_fn(vals))
    n = len(keys)
    metrics = {}
    for i, k in enumerate(keys):
        c = vals[n + i]
        if c > 0:
            metrics[f"val_loss/{k}"] = float(vals[i] / c)

    if collect_health_stats:
        metrics.update(health_stats(params))
    return metrics


def health_stats(params: Any) -> dict[str, float]:
    """max/avg absolute parameter values (reference evaluation.py:11-73)."""
    leaves = jax.tree_util.tree_leaves(params)
    absmax = float(
        jnp.max(jnp.stack([jnp.max(jnp.abs(x)) for x in leaves]))
    )
    total = sum(int(np.prod(x.shape)) for x in leaves)
    abssum = float(sum(jnp.sum(jnp.abs(x)) for x in leaves))
    return {
        "health/param_abs_max": absmax,
        "health/param_abs_avg": abssum / max(1, total),
    }
