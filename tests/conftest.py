"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests run against
`--xla_force_host_platform_device_count=8` as the SURVEY.md §7 test strategy
prescribes. Must run before the first `import jax`.
"""

import os

# Force CPU. Setting the env var is NOT enough on machines where a
# sitecustomize registers a tunneled TPU plugin and overwrites the
# jax_platforms config after import — tests would silently run over the
# tunnel (minutes-long remote compiles, TPU matmul numerics). Overriding the
# config after import wins.
os.environ["JAX_PLATFORMS"] = "cpu"
# Pure-XLA TF execution (oneDNN custom ops round differently and flip
# near-tie NMS selections — breaks jax2tf export verification and makes
# the TF-oracle comparisons kernel-library-dependent).
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
