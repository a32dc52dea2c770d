"""Test harness: run everything on an 8-virtual-device CPU mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon, so the platform is forced via
jax.config before any device is touched. Matmul precision is set to highest so
numeric comparisons against torch golden values are meaningful.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_RESULTS = "/root/reference/results"


@pytest.fixture
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def tiny_dataset():
    """Small synthetic image dataset (uint8, 32x32x1) for training tests."""
    from disvae_tpu.data.datasets import ArrayDataset
    rng = np.random.RandomState(0)
    imgs = (rng.rand(96, 32, 32, 1) * 255).astype(np.uint8)
    return ArrayDataset(imgs)


@pytest.fixture
def tiny_dataset_64():
    from disvae_tpu.data.datasets import ArrayDataset
    rng = np.random.RandomState(1)
    imgs = (rng.rand(64, 64, 64, 3) * 255).astype(np.uint8)
    return ArrayDataset(imgs)


def has_reference_results():
    return os.path.isdir(REFERENCE_RESULTS)
