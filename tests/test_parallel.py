"""SPMD sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
"fake multi-node without a cluster" via xla_force_host_platform_device_count).

The sharded Coach must produce the same training trajectory as the
single-device Coach: identical RNG keys + identical math, only the placement
differs, so metrics should agree to f32 reduction-order noise.
"""

import copy

import jax
import numpy as np
import pytest

from diffmm_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    shard_batch,
    shard_device_data,
)
from diffmm_tpu.data.loader import to_device
from diffmm_tpu.train.coach import Coach


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8, model_parallel=2)


def test_mesh_axes(mesh8):
    assert mesh8.shape[DATA_AXIS] == 4
    assert mesh8.shape[MODEL_AXIS] == 2


def test_shard_batch_even_split(mesh8):
    x = jax.numpy.arange(16, dtype=jax.numpy.int32)
    y = shard_batch(x, mesh8)
    assert len(y.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(y), np.arange(16))


def test_shard_device_data_layout(mesh8, tiny_data):
    dev = shard_device_data(to_device(tiny_data), mesh8)
    # catalog axis of the dense train matrix is model-sharded
    spec = dev.train_store.sharding.spec
    assert spec[1] == MODEL_AXIS
    # edges ride the data axis
    assert dev.adj.ui_rows.sharding.spec[0] == DATA_AXIS
    np.testing.assert_array_equal(
        np.asarray(dev.train_store), tiny_data.train_dense
    )


@pytest.mark.slow
def test_sharded_epoch_matches_single_device(tiny_config, tiny_data):
    """One full epoch + eval: mesh(4x2) vs single device, same seeds."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg_a = copy.deepcopy(tiny_config)
    cfg_b = copy.deepcopy(tiny_config)

    single = Coach(cfg_a, tiny_data)
    r_single = single.train_epoch(0)
    e_single = single.test_epoch()

    mesh = make_mesh(8, model_parallel=2)
    sharded = Coach(cfg_b, tiny_data, mesh=mesh)
    r_sharded = sharded.train_epoch(0)
    e_sharded = sharded.test_epoch()

    for k in r_single:
        assert r_single[k] == pytest.approx(r_sharded[k], rel=2e-3, abs=1e-5), k
    for k in e_single:
        assert e_single[k] == pytest.approx(e_sharded[k], rel=2e-3, abs=1e-5), k


def test_batch_divisibility_guard(tiny_config, tiny_data):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = copy.deepcopy(tiny_config)
    cfg.train.batch = 6  # not divisible by data axis 4
    with pytest.raises(ValueError, match="divisible"):
        Coach(cfg, tiny_data, mesh=make_mesh(8, model_parallel=2))
