"""train.rebuild_order="degree": degree-descending bucketed rebuild top-k.

Semantics contract: the rebuild computes every user's row independently
(reference `Main.py:211-253` iterates a shuffle=True DataLoader,
`DataHandler.py:129` — the reference's own rebuild order is arbitrary), so
visiting users degree-first changes ONLY which q-sample noise draw a user
receives, and nothing at all at ``sampling_step=0``. These tests pin:

  * the host bucket plan partitions every user exactly once with widths
    covering each bucket's max degree;
  * at ``sampling_step=0`` (no noise consumed) a full training epoch is
    IDENTICAL between identity and degree order — edge buffers bitwise,
    params exact;
  * the fused multi-epoch program matches the single-epoch path under
    degree order (the same contract test_fused_epochs pins for identity);
  * a 4x2 mesh epoch matches the single-device epoch under degree order.
"""

import copy
import dataclasses

import jax
import numpy as np
import pytest

from diffmm_tpu.config import Config
from diffmm_tpu.data.synthetic import make_synthetic_host_data
from diffmm_tpu.ops.topk import plan_rebuild_buckets
from diffmm_tpu.parallel import make_mesh
from diffmm_tpu.train.coach import Coach

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box


def _skew(host, user=0, target_degree=40):
    """Give one user a heavy degree so the plan genuinely splits buckets."""
    have = set(
        host.train_cols[
            host.csr_offsets[user]: host.csr_offsets[user]
            + host.user_degrees[user]
        ].tolist()
    )
    extra = [i for i in range(host.item_num) if i not in have]
    extra = extra[: max(0, target_degree - len(have))]
    rows = np.concatenate(
        [host.train_rows, np.full(len(extra), user, np.int32)]
    )
    cols = np.concatenate([host.train_cols, np.asarray(extra, np.int32)])
    order = np.lexsort((cols, rows))
    rows, cols = rows[order].astype(np.int32), cols[order].astype(np.int32)
    degrees = np.bincount(rows, minlength=host.user_num).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(degrees[:-1])]).astype(np.int32)
    return dataclasses.replace(
        host,
        train_rows=rows,
        train_cols=cols,
        user_degrees=degrees,
        csr_offsets=offsets,
        k_max=int(degrees.max()),
        _train_dense=None,  # lazily rebuilt from the new edges on demand
    )


@pytest.fixture(scope="module")
def skewed_data(tiny_config):
    host = make_synthetic_host_data(
        tiny_config, user_num=50, item_num=40, seed=3
    )
    return _skew(host, user=0, target_degree=36)


def _cfg(tiny_config, **overrides):
    cfg = copy.deepcopy(tiny_config)
    cfg.hyper.sampling_step = overrides.pop("sampling_step", 0)
    cfg.train.rebuild_topk = "exact"  # deterministic tie order for parity
    for key, val in overrides.items():
        setattr(cfg.train, key, val)
    return cfg


def test_plan_partitions_users(rng):
    for trial in range(5):
        n = int(rng.integers(3, 200))
        degrees = rng.integers(1, 6, size=n)
        # heavy tail on a few users
        for u in rng.integers(0, n, size=min(3, n)):
            degrees[u] = int(rng.integers(50, 120))
        batch = int(rng.choice([4, 16, 32]))
        plan = plan_rebuild_buckets(degrees, batch, item_num=500)
        seen = np.concatenate([b.reshape(-1) for b in plan.user_blocks])
        # every user appears; pad slots repeat the lightest user
        assert set(seen.tolist()) == set(range(n))
        assert all(b.shape[1] == batch for b in plan.user_blocks)
        # widths cover every member user's degree
        start_block = 0
        for blocks, width in zip(plan.user_blocks, plan.widths):
            assert width <= 500
            assert degrees[blocks.reshape(-1)].max() <= width
            start_block += blocks.shape[0]
        # row_of_user maps into the right bucket's row range
        rows = plan.row_of_user
        assert sorted(rows.tolist()) == list(range(n))
        order = np.argsort(-degrees, kind="stable")
        np.testing.assert_array_equal(rows[order], np.arange(n))


def test_plan_single_bucket_when_uniform():
    degrees = np.full(40, 3, np.int64)
    plan = plan_rebuild_buckets(degrees, 16, item_num=100)
    assert len(plan.user_blocks) == 1
    assert plan.widths[0] >= 3
    assert plan.row_starts == (0,)


def test_degree_epoch_identical_at_step0(tiny_config, skewed_data):
    a = Coach(_cfg(tiny_config, rebuild_order="identity"), skewed_data)
    b = Coach(_cfg(tiny_config, rebuild_order="degree"), skewed_data)
    assert b.rebuild_plan is not None and len(b.rebuild_plan.widths) == 2
    ra = a.train_epoch(0)
    rb = b.train_epoch(0)
    # rebuilt graphs: bitwise identical (no noise is consumed at step 0 and
    # per-user exact top-k does not depend on block composition)
    for x, y in zip(a.edge_buffers, b.edge_buffers):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for k in ra:
        np.testing.assert_allclose(
            float(ra[k]), float(rb[k]), rtol=1e-5, err_msg=k
        )
    for (path, x), y in zip(
        jax.tree_util.tree_leaves_with_path(a.gcn_params),
        jax.tree.leaves(b.gcn_params),
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


def test_degree_fused_matches_single(tiny_config, skewed_data):
    cfg = _cfg(tiny_config, rebuild_order="degree", sampling_step=1)
    a = Coach(copy.deepcopy(cfg), skewed_data)
    b = Coach(copy.deepcopy(cfg), skewed_data)
    a.total_epochs = b.total_epochs = 2
    res_a = [a.train_epoch(e) for e in range(2)]
    res_b = b.train_epochs_fused(0, 2)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(a.key)),
        np.asarray(jax.random.key_data(b.key)),
    )
    for ra, rb in zip(res_a, res_b):
        for k in ra:
            assert abs(float(ra[k]) - float(rb[k])) <= 1e-3 * max(
                1.0, abs(float(ra[k]))
            ), (k, ra[k], rb[k])
    agree = np.mean([
        np.mean(np.asarray(x) == np.asarray(y))
        for x, y in zip(a.edge_buffers, b.edge_buffers)
    ])
    assert agree > 0.99, agree


def test_degree_mesh_matches_single_device(tiny_config, skewed_data):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = _cfg(tiny_config, rebuild_order="degree", sampling_step=1)
    a = Coach(copy.deepcopy(cfg), skewed_data)
    b = Coach(
        copy.deepcopy(cfg), skewed_data, mesh=make_mesh(8, model_parallel=2)
    )
    ra = a.train_epoch(0)
    rb = b.train_epoch(0)
    for k in ra:
        assert abs(float(ra[k]) - float(rb[k])) <= 2e-3 * max(
            1.0, abs(float(ra[k]))
        ), (k, ra[k], rb[k])
    agree = np.mean([
        np.mean(np.asarray(x) == np.asarray(y))
        for x, y in zip(a.edge_buffers, b.edge_buffers)
    ])
    assert agree > 0.99, agree
