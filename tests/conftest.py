"""Test configuration: run every test on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; the sharding/collective paths
are validated on XLA's host platform with 8 virtual devices (SURVEY.md §4).
Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force-set (not setdefault): the image's TPU sitecustomize exports
# JAX_PLATFORMS=axon, which would otherwise grab the single real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The TPU sitecustomize also writes jax.config.jax_platforms directly
# ("axon,cpu"), which outranks the env var — override it before any
# backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
