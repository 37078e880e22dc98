"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Environment must be set before jax is imported anywhere; pytest imports
conftest first, so this executes early enough.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin in this image ignores JAX_PLATFORMS; pin the backend
# through the config API as well (must run before any backend is touched).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def ntu_examples():
    """Bundled (4, 3, 300, 25, 2) pre-normalized NTU samples."""
    path = REFERENCE_DATA / "NTU_preprocessed_skeleton_examples.npy"
    if not path.exists():
        pytest.skip("bundled NTU examples not available")
    return np.load(path).astype(np.float32)


@pytest.fixture(scope="session")
def cmu_mocap():
    path = REFERENCE_DATA / "cmu_mocap.npy"
    if not path.exists():
        pytest.skip("bundled CMU mocap not available")
    return np.load(path)


@pytest.fixture(scope="session")
def simulated_gait():
    path = REFERENCE_DATA / "simulated_gait.npy"
    if not path.exists():
        pytest.skip("bundled simulated gait not available")
    return np.load(path)
