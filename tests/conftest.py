"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on CPU via
``--xla_force_host_platform_device_count`` (SURVEY.md §4); the real-TPU
bench path is exercised separately by bench.py.
"""

import os
import sys

# The environment presets JAX_PLATFORMS=axon (single real TPU via tunnel);
# tests must run on the virtual CPU mesh, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Belt and braces: if anything imported jax before this conftest ran, the
# env var alone won't help — force the platform through the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
