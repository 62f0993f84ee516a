"""Device mesh construction — the TPU-native distributed runtime.

Replaces the reference's Lightning-Fabric strategy factory
(/root/reference/tts/training/environment.py:66-105): instead of process-group
strategies (DDP/FSDP/DeepSpeed), everything runs on ONE logical mesh with
axes ``(data, fsdp, tensor)``:

- ``data``   : batch parallelism (DDP equivalent); rides DCN across hosts.
- ``fsdp``   : parameter/optimizer-state sharding (FSDP / ZeRO equivalent);
               rides ICI within a slice.
- ``tensor`` : tensor parallelism for serving-style model sharding.

GSPMD inserts all collectives from NamedSharding annotations; there are no
explicit NCCL calls to translate.
"""

from __future__ import annotations

import dataclasses
import os
from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tts_max_tpu.core.config import MeshConfig, Strategy

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
AXIS_NAMES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)


@dataclasses.dataclass(frozen=True)
class EnvironmentContext:
    """Process-level distributed context (reference environment.py:108-131).

    On TPU, process discovery happens in ``jax.distributed.initialize`` (hosts
    find the coordinator); rank == jax.process_index().
    """

    global_rank: int
    local_rank: int
    world_size: int
    num_nodes: int
    is_main: bool

    @classmethod
    def create(cls) -> "EnvironmentContext":
        return cls(
            global_rank=jax.process_index(),
            local_rank=0,
            world_size=jax.process_count(),
            num_nodes=jax.process_count(),
            is_main=jax.process_index() == 0,
        )


_DIST_INITIALIZED = False


def initialize_distributed() -> EnvironmentContext:
    """Multi-host rendezvous (reference environment.py:134-224: SLURM rank
    discovery :16-24, env-var rendezvous :157-181, fabric.launch :195-224).

    MUST run before anything touches the JAX backend (``jax.devices()``,
    ``jax.process_count()``, any array op) — backend initialization is
    one-shot, and a process that initializes single-host first can never
    join a multi-host job.

    Rendezvous sources, in precedence order:

    1. Explicit env vars (exported by ``tools/launch_multihost.sh``):
       ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
       ``JAX_PROCESS_ID``.  jax.distributed.initialize does NOT read these
       names from the environment itself — *we* read them here and pass them
       as arguments.
    2. Auto-detection: under SLURM (srun, one task per host) or on a Cloud
       TPU pod, no-arg ``jax.distributed.initialize()`` discovers peers from
       the SLURM env / TPU metadata service.
    3. Neither → single-process; no distributed init at all.
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return EnvironmentContext.create()

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        if coord and nproc and int(nproc) > 1:
            if pid is None:
                raise ValueError(
                    "JAX_PROCESS_ID must be set when JAX_COORDINATOR_ADDRESS/"
                    "JAX_NUM_PROCESSES request a multi-process job"
                )
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        elif int(os.environ.get("SLURM_NTASKS", "1")) > 1 or len(
            os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
        ) > 1:
            # SLURM / TPU-pod auto-detection. A single-entry
            # TPU_WORKER_HOSTNAMES (e.g. "localhost" on a 1-host relay) is
            # NOT a pod; initialize() would fail wanting a coordinator.
            try:
                jax.distributed.initialize()
            except ValueError:
                pass  # auto-detection incomplete -> single-process
    except RuntimeError as e:  # pragma: no cover - double-init guard
        if "already" not in str(e).lower():
            raise
    _DIST_INITIALIZED = True
    return EnvironmentContext.create()


def resolve_mesh_shape(cfg: MeshConfig, n_devices: int) -> tuple[int, int, int]:
    fsdp = max(1, cfg.fsdp)
    tensor = max(1, cfg.tensor)
    if n_devices % (fsdp * tensor) != 0:
        raise ValueError(
            f"mesh (fsdp={fsdp}, tensor={tensor}) does not divide {n_devices} devices"
        )
    data = cfg.data if cfg.data > 0 else n_devices // (fsdp * tensor)
    if data * fsdp * tensor != n_devices:
        raise ValueError(
            f"mesh ({data},{fsdp},{tensor}) != device count {n_devices}"
        )
    return data, fsdp, tensor


def build_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build the global (data, fsdp, tensor) mesh.

    Device order: ``mesh_utils.create_device_mesh`` lays devices out so the
    trailing axes (fsdp/tensor) are ICI-contiguous; the leading data axis can
    span hosts/DCN — collectives for params ride ICI, grad-allreduce rides DCN.
    """
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    shape = resolve_mesh_shape(cfg, len(devices))
    if len(devices) == 1:
        dev_array = np.array(devices).reshape(shape)
    else:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(dev_array, AXIS_NAMES)


def mesh_for_strategy(strategy: Strategy, n_devices: int | None = None) -> Mesh:
    """Convenience: map a reference-style strategy name onto a mesh shape."""
    n = n_devices if n_devices is not None else len(jax.devices())
    s = strategy.canonical()
    if s in (Strategy.SINGLE, Strategy.DP):
        return build_mesh(MeshConfig(data=-1, fsdp=1, tensor=1))
    if s is Strategy.FSDP:
        return build_mesh(MeshConfig(data=1, fsdp=n, tensor=1))
    if s is Strategy.TP:
        return build_mesh(MeshConfig(data=1, fsdp=1, tensor=n))
    if s is Strategy.FSDP_TP:
        fsdp = max(1, n // 2)
        return build_mesh(MeshConfig(data=-1, fsdp=fsdp, tensor=2))
    raise ValueError(f"unknown strategy {strategy}")


_GLOBAL_MESH: Mesh | None = None


def set_global_mesh(mesh: Mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Mesh:
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = build_mesh()
    return _GLOBAL_MESH


@contextmanager
def use_mesh(mesh: Mesh):
    global _GLOBAL_MESH
    prev = _GLOBAL_MESH
    _GLOBAL_MESH = mesh
    try:
        with mesh:
            yield mesh
    finally:
        _GLOBAL_MESH = prev


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
