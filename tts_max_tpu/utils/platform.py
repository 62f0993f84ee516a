"""Platform selection honoring JAX_PLATFORMS despite site customizations.

Some environments (e.g. the axon TPU tunnel) register their PJRT plugin in a
``sitecustomize`` that programmatically forces ``jax_platforms`` AFTER the
env var is read — so ``JAX_PLATFORMS=cpu python ...`` still lands on the
TPU. Entry points call :func:`apply_platform_env` first thing to restore
env-var semantics (a no-op when unset or when backends already initialized).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        pass  # backends already initialized; too late to switch
