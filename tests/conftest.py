"""Test configuration: run the whole unit suite on CPU JAX with 8 virtual
devices so multi-chip sharding logic is exercised without TPU hardware —
the JAX analogue of the reference's gloo-on-CPU multiprocess trick
(reference: tests/_test_utils/torch/distributed/utils.py:33-69).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
