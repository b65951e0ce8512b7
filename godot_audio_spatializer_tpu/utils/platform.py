"""Backend-selection helper.

The bench container's sitecustomize registers the axon TPU backend and sets
``jax_platforms="axon,cpu"`` via jax.config in EVERY python process, so the
``JAX_PLATFORMS`` environment variable alone does not select a backend (the
config value wins).  Call :func:`honor_jax_platforms_env` before the first
backend use to make the env var authoritative again — examples and
subprocess-driven tools use it so ``JAX_PLATFORMS=cpu python examples/…``
really runs on CPU instead of compiling over the TPU tunnel.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


def force_cpu() -> None:
    """Pin this process to the CPU backend (must run before first backend
    use; sitecustomize's jax_platforms config otherwise selects axon)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
