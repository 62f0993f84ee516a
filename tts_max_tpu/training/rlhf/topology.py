"""Trainer/sampler multi-mesh RLHF topology.

Reference parity (/root/reference/tts/training/rlhf/run_rlhf_combine.sh:45-61,
rlhf_main.py:32-37,133-135): the reference runs GRPO across 8 training GPUs
(node 0, accelerate/DDP) against a SEPARATE vLLM server (node 1,
``trl vllm-serve --tensor_parallel_size 8``), pushing updated policy weights
to the server over NCCL between rollout rounds.

The TPU-native analog splits one device set into two disjoint sub-meshes:

- **trainer sub-mesh** — ``(data, fsdp, tensor)``: the GRPO update runs here
  with FSDP/DP-sharded params + optimizer state (GSPMD inserts the grad
  collectives from the input shardings, exactly like the SFT train step).
- **sampler sub-mesh** — tensor-parallel: the continuous-batching serving
  engine (inference/engine.py, the vLLM role) holds a TP-sharded copy of the
  policy and generates the rollouts.

The reference's NCCL weight-broadcast becomes :meth:`push_to_sampler` — a
``jax.device_put`` reshard from trainer shardings to sampler shardings. XLA
routes the transfer device-to-device over ICI; there is no parameter server,
no HTTP channel, and no host round-trip for the weights.

Wired into ``GRPOTrainer(topology=...)`` (grpo.py) and validated on the
virtual 8-device CPU mesh by ``__graft_entry__.dryrun_multichip`` and
tests/test_rlhf_topology.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from tts_max_tpu.core.config import MeshConfig
from tts_max_tpu.parallel import mesh as pmesh
from tts_max_tpu.parallel.sharding import params_shardings


@dataclass(frozen=True)
class TrainerSamplerTopology:
    """Two disjoint sub-meshes over one device set + the weight-push path."""

    trainer_mesh: jax.sharding.Mesh
    sampler_mesh: jax.sharding.Mesh

    @classmethod
    def create(
        cls,
        n_sampler: int,
        devices=None,
        trainer_cfg: MeshConfig | None = None,
        sampler_cfg: MeshConfig | None = None,
    ) -> "TrainerSamplerTopology":
        """Split ``devices`` (default: all) into trainer + sampler meshes.

        The LAST ``n_sampler`` devices become the sampler's TP mesh (on a
        real slice these are ICI-contiguous, so the TP collectives and the
        weight push both ride ICI); the rest form the trainer mesh, default
        ``(data=-1, fsdp=2|1, tensor=1)`` — the reference's DDP role with
        ZeRO-style param sharding when the count allows.
        """
        devices = list(devices if devices is not None else jax.devices())
        n = len(devices)
        if not 1 <= n_sampler < n:
            raise ValueError(
                f"n_sampler={n_sampler} must leave >=1 trainer device of {n}"
            )
        sampler_devices = devices[n - n_sampler:]
        trainer_devices = devices[: n - n_sampler]
        if trainer_cfg is None:
            fsdp = 2 if len(trainer_devices) % 2 == 0 else 1
            trainer_cfg = MeshConfig(data=-1, fsdp=fsdp, tensor=1)
        if sampler_cfg is None:
            sampler_cfg = MeshConfig(data=1, fsdp=1, tensor=n_sampler)
        return cls(
            trainer_mesh=pmesh.build_mesh(trainer_cfg, devices=trainer_devices),
            sampler_mesh=pmesh.build_mesh(sampler_cfg, devices=sampler_devices),
        )

    # --- weight placement ---------------------------------------------------

    def shard_for_trainer(self, params):
        """Place params in the trainer mesh's FSDP/TP shardings."""
        return jax.device_put(params, params_shardings(params, self.trainer_mesh))

    def push_to_sampler(self, params):
        """The reference's NCCL weight-broadcast (rlhf_main.py:133-135):
        reshard the (trainer-sharded) policy params into the sampler mesh's
        tensor-parallel shardings. Device-to-device over ICI; called between
        rollout rounds so the engine always serves the current policy."""
        return jax.device_put(params, params_shardings(params, self.sampler_mesh))
