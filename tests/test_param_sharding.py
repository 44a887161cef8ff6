"""Catalog-axis model parallelism for the wide parameters (SURVEY.md §2.3).

The reference keeps every parameter on one GPU (`Model.py:22`,
`Model.py:156-162`). Here the catalog-dim parameters — ``i_embs`` and the
denoiser's first-in / last-out layers — ride the mesh's model axis, and the
Adam moments inherit the same placement, so parameter + optimizer memory
scales with the axis.
"""

import jax
import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from diffmm_tpu.parallel import MODEL_AXIS, make_mesh
from diffmm_tpu.train.coach import Coach


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8, model_parallel=2)


def _spec(x):
    return tuple(x.sharding.spec)


def test_catalog_params_ride_model_axis(tiny_config, tiny_data, mesh8):
    import copy

    coach = Coach(copy.deepcopy(tiny_config), tiny_data, mesh=mesh8)
    # i_embs rows (items) over the model axis
    assert _spec(coach.gcn_params["i_embs"])[0] == MODEL_AXIS
    # narrow params replicated
    assert all(s is None for s in _spec(coach.gcn_params["u_embs"]))
    for dn in coach.dn_params:
        # first in-layer: input rows (item_num + d_emb) over the model axis
        assert _spec(dn["in_layers"][0]["w"])[0] == MODEL_AXIS
        # last out-layer: output cols (item_num) over the model axis
        assert _spec(dn["out_layers"][-1]["w"])[1] == MODEL_AXIS
        assert _spec(dn["out_layers"][-1]["b"])[0] == MODEL_AXIS
        # hidden layers replicated
        assert all(s is None for s in _spec(dn["emb"]["w"]))


def test_adam_moments_inherit_param_shardings(tiny_config, tiny_data, mesh8):
    import copy

    coach = Coach(copy.deepcopy(tiny_config), tiny_data, mesh=mesh8)
    # optax chain state: find the ScaleByAdamState leaf trees by structure —
    # mu/nu mirror the param tree exactly
    mus = [
        s.mu for s in jax.tree.leaves(
            coach.gcn_opt_state, is_leaf=lambda s: hasattr(s, "mu")
        ) if hasattr(s, "mu")
    ]
    assert mus, "no Adam moment state found"
    assert _spec(mus[0]["i_embs"])[0] == MODEL_AXIS
    dn_mus = [
        s.mu for s in jax.tree.leaves(
            coach.dn_opt_states[0], is_leaf=lambda s: hasattr(s, "mu")
        ) if hasattr(s, "mu")
    ]
    assert _spec(dn_mus[0]["out_layers"][-1]["w"])[1] == MODEL_AXIS


def test_sharded_params_train_and_eval(tiny_config, tiny_data, mesh8):
    import copy

    coach = Coach(copy.deepcopy(tiny_config), tiny_data, mesh=mesh8)
    train = coach.train_epoch(0)
    assert all(np.isfinite(v) for v in train.values()), train
    # params still catalog-sharded after the update step
    assert _spec(coach.gcn_params["i_embs"])[0] == MODEL_AXIS
    assert _spec(coach.dn_params[0]["out_layers"][-1]["w"])[1] == MODEL_AXIS
    result = coach.test_epoch()
    assert 0.0 <= result["Recall"] <= 1.0


def test_uneven_catalog_stays_replicated(tiny_config, mesh8):
    """item_num not divisible by the model axis -> safe replicated fallback
    (JAX rejects uneven device_put shardings)."""
    import copy

    from diffmm_tpu.data.synthetic import make_synthetic_host_data

    cfg = copy.deepcopy(tiny_config)
    host = make_synthetic_host_data(cfg, user_num=40, item_num=37, seed=5)
    coach = Coach(cfg, host, mesh=mesh8)
    assert all(s is None for s in _spec(coach.gcn_params["i_embs"]))
    # 37 + d_emb(10) = 47 is odd too -> replicated
    assert all(s is None for s in _spec(coach.dn_params[0]["in_layers"][0]["w"]))
