"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding logic is validated without TPU hardware via
XLA's forced host platform device count (SURVEY §4).  These env vars must
be set before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset the TPU plugin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax at interpreter startup (to
# register the TPU plugin), which snapshots JAX_PLATFORMS before this file
# runs — override through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_image_root(tmp_path_factory):
    """Session-scoped tiny synthetic MVTec-format dataset."""
    from vad_tpu.data.synthetic import create_synthetic_image_data

    root = tmp_path_factory.mktemp("data")
    create_synthetic_image_data(
        str(root), category="synthetic", n_train=12, n_test_good=4, n_test_defect=6,
        image_size=64,
    )
    return str(root)


@pytest.fixture(scope="session")
def synthetic_video_root(tmp_path_factory):
    """Session-scoped tiny synthetic IPAD-format video dataset."""
    from vad_tpu.data.synthetic import create_synthetic_video_data

    root = tmp_path_factory.mktemp("vdata")
    create_synthetic_video_data(
        str(root), category="S01", n_train_videos=2, n_test_videos=2,
        frames_per_video=24, image_size=64,
    )
    return str(root)
