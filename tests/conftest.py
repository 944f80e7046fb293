"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Tests must run anywhere (CI, dev box) without TPU hardware; multi-chip
sharding tests use the virtual device mesh.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may import jax at interpreter boot (TPU
# tunnel registration), which bakes JAX_PLATFORMS into jax.config before this
# conftest runs — so override the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running multi-chip test")
