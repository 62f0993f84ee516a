"""Test harness: run the identical GSPMD programs on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (see SURVEY.md §4): this lets
DP/FSDP/TP sharding, collectives, checkpointing, and the codec stack be
unit-tested without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("TTS_MAX_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax before conftest runs, so env vars alone
# don't stick — force the platform through the config API (backends are not
# yet instantiated at collection time).
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_threefry_partitionable", True)

from tts_max_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables + constant buffers after every module.

    The full ~470-test suite in one process segfaulted deterministically in
    an XLA:CPU compile near the end (after the torch-heavy w2vbert module)
    in three separate runs, while every subset passed — cumulative
    native-state pressure from hundreds of retained executables. Clearing
    per module keeps the high-water bounded; modules recompile their own
    programs anyway."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def mesh8():
    from tts_max_tpu.core.config import MeshConfig
    from tts_max_tpu.parallel.mesh import build_mesh

    return build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))


@pytest.fixture(scope="session")
def mesh_dp():
    from tts_max_tpu.core.config import MeshConfig
    from tts_max_tpu.parallel.mesh import build_mesh

    return build_mesh(MeshConfig(data=8, fsdp=1, tensor=1))


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
