"""Platform selection honoring JAX_PLATFORMS despite site customizations.

Some environments (e.g. the axon TPU tunnel) register their PJRT plugin in a
``sitecustomize`` that programmatically forces ``jax_platforms`` AFTER the
env var is read — so ``JAX_PLATFORMS=cpu python ...`` still lands on the
TPU. Entry points call :func:`apply_platform_env` first thing to restore
env-var semantics (a no-op when unset or when backends already initialized).

It also enables the persistent XLA compilation cache: serving-engine warmup
compiles cost 243-1108 s through the remote relay toolchain and full-remat
training programs 17-30 min (BENCHMARKS.md) — every process restart repaid
them until round 4. With the cache, a warm restart of the same program is a
disk read. Opt out with TTS_MAX_COMPILATION_CACHE=0 or point the directory
elsewhere with TTS_MAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tts_max_tpu", "xla_compilation"
)


def enable_compilation_cache() -> None:
    """Turn on the persistent (on-disk) XLA compilation cache.

    Safe to call multiple times; honored even after backends initialize
    (the cache is consulted per-compile, not at backend init)."""
    if os.environ.get("TTS_MAX_COMPILATION_CACHE", "1") == "0":
        return
    import jax

    # CPU-backend AOT cache entries can be compiled with pseudo-features
    # (+prefer-no-scatter/-gather) the loader then rejects — and loading
    # them SEGFAULTED a full test run on this image. The cache's real win
    # is the TPU relay's 4-18 min compiles, so enable it only when the
    # resolved platform is not CPU.
    platforms = (
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or ""
    )
    if "cpu" in platforms.split(","):
        return
    cache_dir = os.environ.get(
        "TTS_MAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time; tiny programs
        # are cheap to recompile and would bloat the directory
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (RuntimeError, AttributeError, OSError):
        pass  # unknown config name on this jax version / unwritable dir


def apply_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backends already initialized; too late to switch
    enable_compilation_cache()
