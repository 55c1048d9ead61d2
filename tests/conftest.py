"""Test configuration: run everything on an 8-virtual-device CPU backend.

Multi-chip sharding code is validated on virtual devices
(xla_force_host_platform_device_count), matching how the driver dry-runs
`__graft_entry__.dryrun_multichip`.

Note: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
backend at interpreter start and forces it via jax.config, so plain
JAX_PLATFORMS=cpu env vars are not enough — we must override through
jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
