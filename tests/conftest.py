"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Mirrors the survey's multi-host test recipe (SURVEY.md §4): multi-chip
sharding is validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
