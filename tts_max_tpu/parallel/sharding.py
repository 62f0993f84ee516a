"""Parameter and batch sharding rules (GSPMD NamedSharding annotations).

This module is the TPU-native replacement for the reference's strategy
machinery (environment.py:66-105 DDP/FSDP/DeepSpeed): parameter pytrees get
PartitionSpecs by path-pattern rules, and XLA inserts the collectives.

Rules follow the megatron-style layout for a Llama decoder:
- embeddings / lm_head: vocab sharded over ``tensor``, feature over ``fsdp``
- attention qkv: heads (output feature) over ``tensor``; input feature over ``fsdp``
- attention o:   input feature over ``tensor``; output feature over ``fsdp``
- mlp up/gate:   output feature over ``tensor``; input over ``fsdp``
- mlp down:      input feature over ``tensor``; output over ``fsdp``
- norms / biases / scalars: replicated
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tts_max_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS

# (path regex, spec) — first match wins. Layer params are STACKED over a
# leading n_layers dim (scan-over-layers layout, models/llama.py), hence the
# leading None on "layers/..." rules. Paths look like "layers/attn/wq/kernel".
LLAMA_PARTITION_RULES: tuple[tuple[str, P], ...] = (
    (r"embed/embedding$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r"lm_head/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"layers/attn/w[qkv]/kernel$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"layers/attn/wo/kernel$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"layers/mlp/w_(gate|up)/kernel$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"layers/mlp/w_down/kernel$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    # unstacked variants (single-layer modules, e.g. codec transformer blocks)
    (r"attn/w[qkv]/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"attn/wo/kernel$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r"mlp/w_(gate|up)/kernel$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"mlp/w_down/kernel$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r"norm/scale$", P()),
    (r".*", P()),
)


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path: str, rules=LLAMA_PARTITION_RULES) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def _clamp_spec_to_shape(spec: P, ndim: int) -> P:
    """Trim or pad a spec so len(spec) <= ndim (replicate extra dims)."""
    entries = tuple(spec)
    if len(entries) > ndim:
        entries = entries[:ndim]
    return P(*entries)


def params_shardings(params: Any, mesh: Mesh, rules=LLAMA_PARTITION_RULES):
    """NamedSharding pytree for a parameter pytree, matched by path rules.

    Axes whose size would not divide the parameter dim are dropped
    (replicated) so small models work on any mesh.
    """

    def _one(path, leaf):
        spec = spec_for_path(path_str(path), rules)
        spec = _clamp_spec_to_shape(spec, getattr(leaf, "ndim", 0))
        entries = []
        for dim, axis in zip(leaf.shape, tuple(spec) + (None,) * leaf.ndim):
            if axis is None:
                entries.append(None)
                continue
            axis_size = mesh.shape[axis]
            entries.append(axis if dim % axis_size == 0 and axis_size > 1 else None)
        return NamedSharding(mesh, P(*entries))

    return jax.tree_util.tree_map_with_path(_one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading dim over (data, fsdp) — fsdp also consumes batch
    when params are sharded (ZeRO-DP style), maximizing DP width."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def shard_params(params: Any, mesh: Mesh, rules=LLAMA_PARTITION_RULES):
    shardings = params_shardings(params, mesh, rules)
    return jax.device_put(params, shardings)
