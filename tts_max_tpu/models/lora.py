"""LoRA adapters for the functional SpeechLM.

Reference parity (/root/reference/tts/core/lora.py:8-57 via PEFT): low-rank
adapters on the linear projections (auto-discovering every matmul kernel when
no explicit targets are given), adapter save/load, and merge-for-serving.

Functional design: adapters are a separate pytree mirroring the targeted
kernels. Training merges adapters into the weights inside the loss (so the
model code is unchanged) and differentiates w.r.t. the adapter tree only —
the base stays frozen, exactly PEFT's contract.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tts_max_tpu.parallel.sharding import path_str

# default: every attention/MLP projection (reference auto-discovers all
# nn.Linear targets, lora.py:33-38)
DEFAULT_TARGET_PATTERN = r"(attn|mlp)/[^/]+/kernel$"


def init_lora(
    rng: jax.Array,
    params: Any,
    r: int = 16,
    target_pattern: str = DEFAULT_TARGET_PATTERN,
    dtype=jnp.float32,
) -> Any:
    """Build the adapter tree: for each targeted kernel [..., in, out] an
    {"a": [..., in, r], "b": [..., r, out]} pair (a ~ N(0, 1/r), b = 0 so the
    initial adapter is a no-op)."""
    pattern = re.compile(target_pattern)
    counter = [0]

    def one(path, leaf):
        p = path_str(path)
        if not pattern.search(p) or leaf.ndim < 2:
            return None
        counter[0] += 1
        key = jax.random.fold_in(rng, counter[0])
        *batch, fan_in, fan_out = leaf.shape
        a = (jax.random.normal(key, (*batch, fan_in, r)) * (1.0 / r)).astype(dtype)
        b = jnp.zeros((*batch, r, fan_out), dtype)
        return {"a": a, "b": b}

    return jax.tree_util.tree_map_with_path(one, params)


def merge(params: Any, lora_params: Any, alpha: float, r: int) -> Any:
    """params + (alpha/r) * a@b on every adapted kernel."""
    scale = alpha / r

    def one(p, lp):
        if lp is None:
            return p
        return p + scale * jnp.einsum("...ir,...ro->...io", lp["a"], lp["b"]).astype(
            p.dtype
        )

    return jax.tree_util.tree_map(
        one, params, lora_params, is_leaf=lambda x: x is None or (
            isinstance(x, dict) and set(x) == {"a", "b"}
        )
    )


def trainable_count(lora_params: Any) -> int:
    return sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(lora_params)
    )


def save_adapter(path: str, lora_params: Any) -> None:
    """Flat .npz adapter file (reference save_lora_adapter, lora.py:50-57)."""
    flat = {}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(lora_params)[0]:
        flat[path_str(kpath)] = np.asarray(leaf)
    np.savez(path, **flat)


def load_adapter(path: str, lora_template: Any) -> Any:
    data = np.load(path)

    def one(kpath, leaf):
        return jnp.asarray(data[path_str(kpath)])

    return jax.tree_util.tree_map_with_path(one, lora_template)


def lora_loss_fn(base_params: Any, alpha: float, r: int, loss_fn):
    """Wrap a loss over params into a loss over adapters (base frozen)."""

    def fn(lora_params, *args, **kw):
        merged = merge(jax.lax.stop_gradient(base_params), lora_params, alpha, r)
        return loss_fn(merged, *args, **kw)

    return fn
