"""Test env: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4/§7).

NOTE: in this image a sitecustomize pre-imports jax and registers the
axon TPU plugin before pytest starts, so plain ``os.environ`` settings
are too late.  ``jax.config.update('jax_platforms', ...)`` still works
as long as no backend has been initialized, and the CPU client reads
``XLA_FLAGS`` at backend-init time, so both are applied here, at
conftest import, before any test touches a device.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
