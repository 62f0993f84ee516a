"""Multi-host batch assembly and cross-process coordination.

The reference's per-rank DataLoader rows + DDP collectives
(environment.py/training_loop.py) map to: each process loads only its rows
(data/loader.py per-process sharding) and
``jax.make_array_from_process_local_data`` assembles the logical global
array across hosts — XLA then treats it as one sharded batch.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import NamedSharding


def make_global_batch(batch: dict[str, Any], shardings: dict[str, NamedSharding]):
    """Per-process local batch dict -> global sharded arrays.

    Single-process: a plain device_put. Multi-host: each process contributes
    its local rows to the global array (global batch = world_size × local).
    """
    out = {}
    multi = jax.process_count() > 1
    for k, v in batch.items():
        sh = shardings[k]
        v = np.asarray(v)
        if multi:
            out[k] = jax.make_array_from_process_local_data(sh, v)
        else:
            out[k] = jax.device_put(v, sh)
    return out


def barrier(name: str = "barrier") -> None:
    """Cross-process sync point (reference fabric.barrier sites)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
