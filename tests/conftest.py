"""Test configuration: force an 8-device virtual CPU mesh so pjit/sharding
paths are exercised without TPU hardware (standard JAX testing pattern)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
# Pin the suite to threefry regardless of the drivers' rbg default: rbg
# bit-streams are not guaranteed stable across jax/XLA upgrades (the golden
# parity bands must not drift), and use_fast_prng() inside a driver test
# must not change the PRNG of tests that happen to run after it.
os.environ.setdefault("PLANKTON_PRNG", "threefry")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin prepends itself to jax_platforms from sitecustomize,
# overriding the env var; force CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402
from pathlib import Path  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    from multimodal_plankton_recognition_tpu.data.synthetic import (
        make_synthetic_dataset,
    )
    root = tmp_path_factory.mktemp("plankton_data")
    split_dir = make_synthetic_dataset(root, n_classes=3, n_per_class=8, seed=0)
    return split_dir
