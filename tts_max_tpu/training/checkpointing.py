"""Checkpoint save/load/resume — Orbax-backed.

Replaces ``fabric.save/load`` (reference checkpointing.py:13-65):
checkpoints hold {params, opt_state, statistics, config}; pruning to the
last N is handled by Orbax's CheckpointManager; sharded arrays save/restore
with their shardings (the FSDP full-state-dict dance disappears).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from tts_max_tpu.core.config import ExperimentConfig, to_dict
from tts_max_tpu.utils.statistics import Statistics

CONFIG_FILE_NAME = "training_config.json"


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for the training loop."""

    def __init__(
        self,
        directory: str,
        keep_last_n: int = 10,
        async_save: bool = True,
    ):
        os.makedirs(directory, exist_ok=True)
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_last_n,
            create=True,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any,
        statistics: Statistics,
        config: ExperimentConfig | None = None,
    ) -> None:
        items = {
            "params": ocp.args.StandardSave(params),
            "opt_state": ocp.args.StandardSave(opt_state),
            "meta": ocp.args.JsonSave(
                {
                    "statistics": statistics.state_dict(),
                    "config": to_dict(config) if config else None,
                    "step": step,
                }
            ),
        }
        self._mgr.save(step, args=ocp.args.Composite(**items))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(
        self,
        step: int | None,
        params_template: Any,
        opt_state_template: Any,
        weights_only: bool = False,
    ) -> tuple[Any, Any, Statistics | None]:
        """Restore into the (possibly sharded/abstract) templates.

        weights_only mirrors ``only_load_model_weights``
        (reference configuration.py:95-96): params restored, optimizer state
        and statistics left fresh.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        as_abstract = lambda tree: jax.tree_util.tree_map(  # noqa: E731
            ocp.utils.to_shape_dtype_struct, tree
        )
        if weights_only:
            out = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    params=ocp.args.StandardRestore(as_abstract(params_template))
                ),
            )
            return out["params"], opt_state_template, None
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(as_abstract(params_template)),
                opt_state=ocp.args.StandardRestore(as_abstract(opt_state_template)),
                meta=ocp.args.JsonRestore(),
            ),
        )
        stats = Statistics.from_state_dict(out["meta"]["statistics"])
        return out["params"], out["opt_state"], stats

    def close(self) -> None:
        self._mgr.close()


def save_config(output_dir: str, config: ExperimentConfig) -> str:
    """Persist the full config next to checkpoints
    (reference checkpointing.py:70-86)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, CONFIG_FILE_NAME)
    with open(path, "w") as f:
        json.dump(to_dict(config), f, indent=2)
    return path


def save_final_model(output_dir: str, params: Any) -> str:
    """Final weights (reference main.py:240-247 final_model.pt equivalent)."""
    path = os.path.join(output_dir, "final_model")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        jax.tree_util.tree_map(np.asarray, params),
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def load_final_model(path: str, params_template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, params_template)
    return ckptr.restore(os.path.abspath(path), abstract)
