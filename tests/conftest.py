"""Test configuration: run the whole unit suite on CPU JAX with 8 virtual
devices so multi-chip sharding logic is exercised without TPU hardware —
the JAX analogue of the reference's gloo-on-CPU multiprocess trick
(reference: tests/_test_utils/torch/distributed/utils.py:33-69).
"""

import os

# Must be set before the backend is initialized. NOTE: this environment's
# sitecustomize force-registers the axon TPU platform and overrides
# JAX_PLATFORMS, so the env-var alone is NOT enough — we must also update
# jax.config before first device use.
# MODELOPT_TPU_TESTS=1 keeps the real backend (for the tests/tpu/ hardware
# tier, the analogue of the reference's tests/gpu/); default is the CPU
# 8-virtual-device unit tier.
_TPU_TIER = os.environ.get("MODELOPT_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_TIER and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

if not _TPU_TIER:
    assert jax.default_backend() == "cpu", "unit tests must run on CPU"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
