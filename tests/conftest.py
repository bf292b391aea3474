"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

# must be set before jax is imported anywhere; override any inherited TPU
# platform (the test suite runs on a virtual CPU mesh; the bench runs on TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# the axon sitecustomize registers the TPU backend and overrides the platform
# config at import time; force it back to cpu for the test suite
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _reset_bn_axis():
    """The Trainer sets a process-global BN sync axis; reset it so standalone
    module applications outside shard_map don't see an unbound axis name."""
    from waveformml_tpu.nn.bn import set_bn_axis

    set_bn_axis(None)
    yield
    set_bn_axis(None)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture
def tmp_model_dir(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    return str(d)
