"""Test environment: CPU JAX with 8 virtual devices for sharding tests.

Must set flags before jax initializes a backend (SURVEY.md §4: the JAX-native
"fake multi-node without a cluster" mechanism).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Force CPU even when the ambient environment selects a TPU backend.
# The ambient sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon, so the env var is already consumed — the config
# update is the only override that still works post-import.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from diffmm_tpu.config import Config
from diffmm_tpu.data.synthetic import make_synthetic_host_data


@pytest.fixture(scope="session")
def tiny_config() -> Config:
    cfg = Config()
    cfg.base.seed = 7
    cfg.base.latdim = 16
    cfg.base.denoise_dim = "[32]"
    cfg.train.batch = 16
    cfg.train.test_batch = 8
    cfg.train.epoch = 3
    cfg.hyper.steps = 5
    return cfg


@pytest.fixture(scope="session")
def tiny_data(tiny_config):
    return make_synthetic_host_data(tiny_config, user_num=50, item_num=40, seed=3)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
