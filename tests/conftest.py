"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Mirrors the survey's multi-host test recipe (SURVEY.md §4): multi-chip
sharding is validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count``.

Note: this environment ships an `axon` TPU-tunnel PJRT plugin that
intercepts ``JAX_PLATFORMS=cpu``; an *empty* ``JAX_PLATFORMS`` plus
``JAX_PLATFORM_NAME=cpu`` reliably selects the host CPU backend.
"""

import os

os.environ["JAX_PLATFORMS"] = ""
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
