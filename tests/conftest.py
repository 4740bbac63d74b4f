"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere: tests exercise the multi-chip
sharding paths on a virtual host-platform mesh (the standard fake-TPU trick),
while real-hardware runs (bench.py, CLI) keep the default platform.
"""

import os

# NOTE: this environment pins JAX_PLATFORMS=axon (tunneled TPU) via a
# sitecustomize hook, so the env-var route is overridden; force CPU through
# the config API instead.  XLA_FLAGS must still be set before backend init.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference artifacts not mounted"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12)
