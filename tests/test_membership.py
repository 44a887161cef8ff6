"""Membership store (data/membership.py): the O(nnz) CSR form must be
bit-identical to the dense (U, I) matrix everywhere it is consumed —
diffusion rows, negative-sampling bits, eval masks — and a sparse-form run
must carry NO O(U·I) array anywhere (VERDICT r4 #1; the reference
materializes the dense matrix unconditionally, `DataHandler.py:128`)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmm_tpu.data.loader import to_device
from diffmm_tpu.data.membership import (
    TrainCSR,
    contains,
    gather_item_lists,
    gather_rows,
    make_train_csr,
    plan_head_tail,
)


@pytest.fixture(scope="module")
def stores(tiny_data):
    dev = to_device(tiny_data, train_store="dense")
    csr = make_train_csr(
        dev.train_cols, dev.csr_offsets, dev.user_degrees, tiny_data.k_max
    )
    return dev.train_store, csr, tiny_data


@pytest.fixture(scope="module")
def split_csr(stores):
    """The same store with a FORCED head/tail split (k_cut low enough that
    several users are heavy) — exercises the fixup scatter on data whose
    natural plan might not split."""
    _, csr, host = stores
    deg = np.asarray(host.user_degrees)
    k_cut = max(1, int(np.median(deg)))
    heavy = np.flatnonzero(deg > k_cut).astype(np.int32)
    assert heavy.size > 0, "tiny fixture has no heavy users at median cut"
    return make_train_csr(
        csr.cols, csr.offsets, csr.degrees, csr.k_max, k_cut, heavy
    )


def test_gather_rows_bit_identical(stores, rng):
    dense, csr, host = stores
    users = jnp.asarray(
        rng.integers(0, host.user_num, 33).astype(np.int32)
    )
    a = np.asarray(gather_rows(dense, users, host.item_num))
    b = np.asarray(gather_rows(csr, users, host.item_num))
    np.testing.assert_array_equal(a, b)
    # and both equal the host matrix rows
    np.testing.assert_array_equal(
        a, host.train_dense[np.asarray(users)].astype(np.float32)
    )


def test_gather_rows_head_tail_split_bit_identical(stores, split_csr, rng):
    """Forced split: every block shape — heavy users present, absent, and
    edge-pad sentinel user ids — must reproduce the dense rows exactly."""
    dense, _, host = stores
    heavy = np.asarray(split_csr.heavy_ids)
    light = np.setdiff1d(
        np.arange(host.user_num, dtype=np.int32), heavy
    )
    blocks = [
        rng.integers(0, host.user_num, 17).astype(np.int32),  # mixed
        heavy[: min(5, heavy.size)],  # all heavy
        light[:7],  # no heavy
        np.concatenate(  # sentinel pad lanes alongside a heavy user
            [heavy[:1], np.full(3, host.user_num, np.int32), light[:2]]
        ),
    ]
    for users_np in blocks:
        users = jnp.asarray(users_np)
        a = np.asarray(gather_rows(dense, users, host.item_num))
        b = np.asarray(gather_rows(split_csr, users, host.item_num))
        # pad-row CONTENT is out of contract (callers mask those rows; the
        # dense gather itself fill-values them) — the guard is that pad
        # lanes never corrupt the in-range rows
        in_range = users_np < host.user_num
        np.testing.assert_array_equal(a[in_range], b[in_range])


def test_plan_head_tail():
    # power-law degrees: a few hubs, long tail -> split engages
    deg = np.array([600, 300] + [3] * 1000)
    k_cut, heavy = plan_head_tail(deg, k_max=600, block=256)
    assert k_cut < 600 and heavy is not None
    assert set(heavy.tolist()) == {0, 1} or (deg[heavy] > k_cut).all()
    assert (np.sort(deg[heavy])[::-1] > k_cut).all()
    assert (deg[np.setdiff1d(np.arange(deg.size), heavy)] <= k_cut).all()
    # uniform degrees: no split
    k_cut, heavy = plan_head_tail(np.full(100, 7), k_max=7, block=32)
    assert k_cut == 7 and heavy is None
    # store built from a no-split plan keeps the plain path
    s = make_train_csr(
        jnp.zeros(8, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.full(4, 2, jnp.int32), 2, 2, None,
    )
    assert s.heavy_ids is None and s.k_cut == s.k_max


def test_contains_bit_identical(stores, rng):
    dense, csr, host = stores
    n = 500
    users = rng.integers(0, host.user_num, n).astype(np.int32)
    items = rng.integers(0, host.item_num, n).astype(np.int32)
    # force coverage of both outcomes: half the lanes query a KNOWN edge
    half = n // 2
    edge_pick = rng.integers(0, host.nnz, half)
    users[:half] = host.train_rows[edge_pick]
    items[:half] = host.train_cols[edge_pick]
    u, i = jnp.asarray(users), jnp.asarray(items)
    a = np.asarray(contains(dense, u, i))
    b = np.asarray(contains(csr, u, i))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, host.train_dense[users, items] != 0)
    assert a[:half].all()  # the known edges were found


def test_contains_span_boundaries(stores):
    """Lower-bound edge cases: items below/above a user's whole span, and
    the span's first/last items."""
    _, csr, host = stores
    u = 7
    span = host.train_cols[
        host.csr_offsets[u] : host.csr_offsets[u] + host.user_degrees[u]
    ]
    lo_item, hi_item = int(span[0]), int(span[-1])
    queries = [
        (u, lo_item, True),
        (u, hi_item, True),
        (u, max(lo_item - 1, 0), (max(lo_item - 1, 0)) in set(span.tolist())),
        (
            u,
            min(hi_item + 1, host.item_num - 1),
            (min(hi_item + 1, host.item_num - 1)) in set(span.tolist()),
        ),
    ]
    users = jnp.asarray([q[0] for q in queries], jnp.int32)
    items = jnp.asarray([q[1] for q in queries], jnp.int32)
    got = np.asarray(contains(csr, users, items))
    np.testing.assert_array_equal(got, [q[2] for q in queries])


def test_gather_item_lists_spans(stores):
    _, csr, host = stores
    users = jnp.arange(host.user_num, dtype=jnp.int32)
    items, valid = jax.jit(gather_item_lists)(csr, users)
    items, valid = np.asarray(items), np.asarray(valid)
    for u in range(host.user_num):
        deg = int(host.user_degrees[u])
        assert valid[u, :deg].all() and not valid[u, deg:].any()
        start = int(host.csr_offsets[u])
        np.testing.assert_array_equal(
            items[u, :deg], host.train_cols[start : start + deg]
        )


def test_negative_sampling_identical_across_stores(stores):
    from diffmm_tpu.data.sampling import negative_sampling

    dense, csr, host = stores
    users = jnp.asarray(host.train_rows)
    key = jax.random.PRNGKey(42)
    a = np.asarray(negative_sampling(key, users, dense, host.item_num))
    b = np.asarray(negative_sampling(key, users, csr, host.item_num))
    np.testing.assert_array_equal(a, b)
    assert (host.train_dense[host.train_rows, a] == 0).all()


def test_eval_identical_across_stores(stores, tiny_config, rng):
    from diffmm_tpu.eval.ranking import dcg_table, make_eval_batch

    dense, csr, host = stores
    d = 16
    u_final = jnp.asarray(rng.standard_normal((host.user_num, d)), jnp.float32)
    i_final = jnp.asarray(rng.standard_normal((host.item_num, d)), jnp.float32)
    users = jnp.asarray(host.test_users[:8])
    valid = jnp.ones(8, dtype=bool)
    items = jnp.asarray(host.test_items[:8])
    counts = jnp.asarray(host.test_counts[:8])
    prog = make_eval_batch(tiny_config.base.topk)
    cum = dcg_table(tiny_config.base.topk)
    a = prog(u_final, i_final, users, valid, dense, items, counts, cum)
    b = prog(u_final, i_final, users, valid, csr, items, counts, cum)
    for x, y in zip(a, b):
        assert float(x) == float(y)


def _assert_no_ui_arrays(tree, user_num: int, item_num: int, where: str):
    big = user_num * item_num
    for leaf in jax.tree_util.tree_leaves(tree):
        shape = tuple(getattr(leaf, "shape", ()))
        assert shape != (user_num, item_num), (where, shape)
        assert int(np.prod(shape or (1,))) < big, (where, shape)


@pytest.mark.slow
def test_sparse_form_has_no_ui_array(tiny_config, tiny_data):
    """The web-scale contract: a sparse-form run holds NO O(U·I) array —
    not on device (DeviceData, params, optimizer state, adjacencies) and
    not on host (HostData never materializes the dense matrix)."""
    from diffmm_tpu.train.coach import Coach

    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "sparse"
    cfg.train.epoch_scan = 2
    host = copy.deepcopy(tiny_data)
    host._train_dense = None  # session fixture may have built it lazily
    coach = Coach(cfg, host)
    assert isinstance(coach.data.train_store, TrainCSR)
    coach.train_epoch(0)
    coach.test_epoch()
    coach.train_epochs_fused(1, 2, "test")  # fused path incl. in-program eval
    U, I = host.user_num, host.item_num
    _assert_no_ui_arrays(coach.data, U, I, "DeviceData")
    _assert_no_ui_arrays(coach.gcn_params, U, I, "gcn_params")
    _assert_no_ui_arrays(coach.dn_params, U, I, "dn_params")
    _assert_no_ui_arrays(coach.gcn_opt_state, U, I, "gcn_opt")
    _assert_no_ui_arrays(coach.dn_opt_states, U, I, "dn_opt")
    _assert_no_ui_arrays(coach.edge_buffers, U, I, "edge_buffers")
    assert host._train_dense is None, "host dense matrix was materialized"


@pytest.mark.slow
def test_sparse_form_trajectory_parity_across_stores(tiny_config, tiny_data):
    """Same seeds, sparse graph form: the csr and (forced) dense stores
    must produce the SAME trajectory and eval — the store is a
    representation change, not a semantic one."""
    from diffmm_tpu.train.coach import Coach

    results = {}
    for store in ("csr", "dense"):
        cfg = copy.deepcopy(tiny_config)
        cfg.train.graph_form = "sparse"
        cfg.train.train_store = store
        coach = Coach(cfg, tiny_data)
        r = coach.train_epoch(0)
        e = coach.test_epoch()
        results[store] = (r, e)
    r_csr, e_csr = results["csr"]
    r_dense, e_dense = results["dense"]
    for k in r_csr:
        assert r_csr[k] == pytest.approx(r_dense[k], abs=1e-6), k
    for k in e_csr:
        assert e_csr[k] == pytest.approx(e_dense[k], abs=1e-9), k
