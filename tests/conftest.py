"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Mirrors the survey's multi-host test recipe (SURVEY.md §4): multi-chip
sharding is validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count``.

Note: this environment ships an `axon` TPU-tunnel PJRT plugin whose
``sitecustomize`` imports JAX at interpreter start with
``JAX_PLATFORMS=axon`` in the environment, so mutating ``os.environ``
here is too late — the config is already latched, and backend selection
(and with it op execution) can ride the TPU tunnel.  A degraded tunnel
then makes CPU-only tests hang or return corrupted results.  Tests must
be hermetic: pin the platform list to ``cpu`` through the live JAX
config before any backend client is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
