"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``) since only one physical TPU chip
is available in CI; the same `jax.sharding` code paths run on real meshes.

Note: the environment may pre-register an accelerator platform via
sitecustomize and force ``jax_platforms`` through `jax.config`, so we must
override through `jax.config` as well (env vars alone are ignored).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
