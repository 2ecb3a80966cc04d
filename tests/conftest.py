"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (``JAX_PLATFORMS=cpu``) with 8 virtual devices so that
multi-chip sharding paths (``parallel/``) execute and are validated without
TPU hardware, per the reference's own strategy of testing multi-board
behavior with protocol-level fakes (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers its TPU platform in jax config at
# interpreter startup; override it back to CPU before the backend
# initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

TESTDATA = "/root/reference/testdata"


@pytest.fixture(scope="session")
def stereo_pair_small():
    """The canonical 640x480 boot pair (cmd/root.go:162-171), as exact gray."""
    from steroscopic_hardware_tpu.ops.gray import load_gray

    left = load_gray(os.path.join(TESTDATA, "L_00001.png"))
    right = load_gray(os.path.join(TESTDATA, "R_00001.png"))
    return left, right


# function-scoped: every test gets the same fresh deterministic stream,
# so adding/removing/reordering tests can never change another test's
# random draws (session scope made thresholds order-dependent)
@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
