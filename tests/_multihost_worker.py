"""Worker process for tests/test_multihost.py — one of N jax.distributed
processes rendezvousing over localhost CPU.

Exercises the full multi-host contract on CPU (SURVEY.md §4: identical GSPMD
programs run on CPU): rendezvous via env vars read by
``initialize_distributed`` (reference environment.py:134-224), global batch
assembly from process-local rows, a sharded train step whose grad-allreduce
crosses processes, cross-process barrier, and Orbax save/restore.

Usage: _multihost_worker.py <out_dir>   (env carries the rendezvous vars)
"""

import os
import sys

import jax

# The axon sitecustomize may programmatically force the TPU platform; undo it
# before any backend touch (mirrors tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_max_tpu.core.config import MeshConfig  # noqa: E402
from tts_max_tpu.models import llama  # noqa: E402
from tts_max_tpu.parallel import mesh as pmesh  # noqa: E402
from tts_max_tpu.parallel.multihost import barrier, make_global_batch  # noqa: E402
from tts_max_tpu.training import optim, train_step as ts  # noqa: E402
from tts_max_tpu.training.checkpointing import CheckpointManager  # noqa: E402
from tts_max_tpu.utils.statistics import Statistics  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]

    # --- rendezvous (must precede any backend use) ---
    env = pmesh.initialize_distributed()
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    assert env.world_size == nproc
    assert env.global_rank == int(os.environ["JAX_PROCESS_ID"])
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nproc * n_local, (n_global, nproc, n_local)

    mesh = pmesh.build_mesh(MeshConfig(data=-1, fsdp=1, tensor=1))

    # --- global batch assembly from process-local rows ---
    cfg = llama.tiny_config(vocab_size=64, max_seq_len=16)
    local_b = n_local  # one row per local device
    rng = np.random.default_rng(1234 + env.global_rank)
    ids = rng.integers(3, 64, size=(1, local_b, 16)).astype(np.int32)
    labels = ids.copy()
    labels[..., :2] = -100
    sh = ts.data_sh_axis1(mesh)
    batch = make_global_batch(
        {"input_ids": ids, "labels": labels},
        {"input_ids": sh, "labels": sh},
    )
    assert batch["input_ids"].shape == (1, nproc * local_b, 16)

    # --- sharded train step: grad allreduce crosses the process boundary ---
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.create_optimizer(optim.cosine_warmup_schedule(1e-3, 2, 10))
    with mesh:
        opt_state = jax.jit(tx.init)(params)
        step = ts.make_train_step(mesh, cfg, tx, params)
        new_params, new_opt_state, metrics = step(params, opt_state, batch)
        loss = float(metrics.loss)
        assert np.isfinite(loss)

        barrier("post-step")

        # --- distributed Orbax save + restore (shared filesystem) ---
        mgr = CheckpointManager(
            os.path.join(out_dir, "ckpt"), keep_last_n=1, async_save=False
        )
        stats = Statistics()
        stats.step = 1
        mgr.save(1, new_params, new_opt_state, stats)
        mgr.wait()
        p2, _, s2 = mgr.restore(None, new_params, new_opt_state)
        assert s2.step == 1
        np.testing.assert_allclose(
            np.asarray(jax.device_get(p2["norm"]["scale"])),
            np.asarray(jax.device_get(new_params["norm"]["scale"])),
        )
        mgr.close()

    # Identical loss on every process proves the batch/grads were global.
    print(f"MULTIHOST_OK rank={env.global_rank} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
