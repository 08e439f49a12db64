"""Test harness: run everything on an 8-device virtual CPU mesh.

SURVEY.md section 4(c): multi-chip paths (sharded index, per-shard top-k +
allgather) must run in CI without TPUs. Setting the XLA host-platform device
count BEFORE jax initializes gives 8 virtual CPU devices; Pallas kernels run
in interpret mode on CPU (ops/maxsim.py auto-detects the backend).
"""

import os

# Force CPU: the ambient environment points JAX at a tunneled TPU (the
# sitecustomize plugin rewrites jax_platforms to "axon,cpu" at import), so a
# plain env var is not enough — override the config before backends init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
