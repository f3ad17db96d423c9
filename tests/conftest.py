"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests are hermetic and do not require TPU hardware.

The container's sitecustomize registers an 'axon' TPU backend eagerly and
pins JAX_PLATFORMS=axon, so we must override both the env var and the jax
config value (the latter wins once the backend is registered).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
