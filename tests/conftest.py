"""Test env: force a true CPU backend with 8 virtual devices so multi-chip
sharding layouts (mesh/pjit/shard_map) are exercised without TPU hardware.

Note: this environment's axon sitecustomize registers a tunneled TPU
backend and sets ``jax_platforms`` programmatically, which overrides the
``JAX_PLATFORMS`` env var — the config must be re-set after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
