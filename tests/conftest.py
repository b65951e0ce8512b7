"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated on
host-platform virtual devices (see SURVEY.md §5.8).  The container's
sitecustomize registers the axon TPU backend and sets
jax_platforms="axon,cpu" in every process, so an env var alone is not
enough — we update the jax config directly before any backend initializes.
"""

import os

if os.environ.get("GAS_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
# GAS_TEST_TPU=1: leave the default (axon TPU) backend for the
# tests/test_fused_tpu.py hardware parity run
