"""Dense-MXU graph form vs the segment-sum SpMM reference path."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmm_tpu.ops.graph import (
    build_bi_adj_host,
    build_dense_bi_adj_device,
    spmm_bi,
)
from diffmm_tpu.train.coach import Coach


def test_dense_spmm_matches_sparse(tiny_data):
    rows = jnp.asarray(tiny_data.train_rows)
    cols = jnp.asarray(tiny_data.train_cols)
    U, I = tiny_data.user_num, tiny_data.item_num
    sparse = build_bi_adj_host(tiny_data.train_rows, tiny_data.train_cols, U, I)
    dense = build_dense_bi_adj_device(rows, cols, user_num=U, item_num=I)

    np.testing.assert_allclose(
        np.asarray(dense.s_user), np.asarray(sparse.s_user), rtol=1e-6
    )
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.standard_normal((U, 16)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((I, 16)).astype(np.float32))
    yu_s, yi_s = spmm_bi(sparse, xu, xi)
    yu_d, yi_d = spmm_bi(dense, xu, xi)
    # dense path rounds the embeddings to bf16 on the MXU input
    np.testing.assert_allclose(np.asarray(yu_d), np.asarray(yu_s), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(yi_d), np.asarray(yi_s), rtol=2e-2, atol=2e-2)


def test_dense_builder_drops_sentinels():
    rows = jnp.array([0, 0, 1, 3, 3], dtype=jnp.int32)  # 3 == user_num sentinel
    cols = jnp.array([1, 2, 0, 4, 4], dtype=jnp.int32)  # 4 == item_num sentinel
    adj = build_dense_bi_adj_device(rows, cols, user_num=3, item_num=4)
    mat = np.asarray(adj.mat, dtype=np.float32)
    want = np.zeros((3, 4), dtype=np.float32)
    want[0, 1] = want[0, 2] = want[1, 0] = 1.0
    np.testing.assert_array_equal(mat, want)
    np.testing.assert_allclose(
        np.asarray(adj.s_user), (np.array([2.0, 1.0, 0.0]) + 1) ** -0.5, rtol=1e-6
    )


@pytest.mark.slow
def test_dense_epoch_close_to_sparse(tiny_config, tiny_data):
    cfg_s = copy.deepcopy(tiny_config)
    cfg_s.train.graph_form = "sparse"
    cfg_d = copy.deepcopy(tiny_config)
    cfg_d.train.graph_form = "dense"

    a = Coach(cfg_s, tiny_data)
    b = Coach(cfg_d, tiny_data)
    ra = a.train_epoch(0)
    rb = b.train_epoch(0)
    for k in ra:
        assert ra[k] == pytest.approx(rb[k], rel=0.05, abs=1e-3), k
    ea, eb = a.test_epoch(), b.test_epoch()
    for k in ea:
        assert ea[k] == pytest.approx(eb[k], rel=0.2, abs=0.02), k


def test_auto_picks_dense_for_tiny(tiny_config, tiny_data):
    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "auto"
    coach = Coach(cfg, tiny_data)
    assert coach.dense_graphs


def test_choose_graph_form_scales_with_model_axis():
    from diffmm_tpu.train.coach import DENSE_GRAPH_BUDGET_BYTES, choose_graph_form

    # a shape just past the single-device budget (bf16-stored blocks)
    U = 60000
    I = (DENSE_GRAPH_BUDGET_BYTES // (3 * U * 2)) + 100
    assert not choose_graph_form("auto", 2, U, I, model_parallel=1, bytes_per_cell=2)
    # catalog-sharding over 4 model-axis devices lifts the budget
    assert choose_graph_form("auto", 2, U, I, model_parallel=4, bytes_per_cell=2)
    assert choose_graph_form("dense", 2, U, I, 1)
    assert not choose_graph_form("sparse", 2, 10, 10, 8)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="auto\\|dense\\|sparse"):
        choose_graph_form("Dense", 2, 10, 10, 1)


def test_choose_graph_form_device_budget():
    """VERDICT r4 #6: 'auto' derives its budget from the actual device's
    HBM limit (1/4 of bytes_limit, the v5e calibration) instead of a
    hardcoded 4 GiB — a 32 GiB chip keeps dense at shapes an 8 GiB chip
    must run sparse."""
    from diffmm_tpu.train.coach import (
        DENSE_GRAPH_BUDGET_BYTES,
        _DENSE_BUDGET_HBM_FRACTION,
        choose_graph_form,
        dense_graph_budget_bytes,
    )

    class FakeDev:
        def __init__(self, limit):
            self._limit = limit

        def memory_stats(self):
            return {"bytes_limit": self._limit} if self._limit else None

    assert dense_graph_budget_bytes(FakeDev(16 << 30)) == int(
        (16 << 30) * _DENSE_BUDGET_HBM_FRACTION
    )
    # no stats (CPU and some virtual backends) -> the calibrated fallback
    assert dense_graph_budget_bytes(FakeDev(0)) == DENSE_GRAPH_BUDGET_BYTES

    # 3 int8 blocks ≈ 3 GiB + the bf16 transient reserve = 5 GiB needed:
    # fits a 32 GiB chip's derived budget (8 GiB), not an 8 GiB chip's (2)
    U = 60_000
    I = (3 << 30) // (3 * U)
    big = int((32 << 30) * _DENSE_BUDGET_HBM_FRACTION)
    small = int((8 << 30) * _DENSE_BUDGET_HBM_FRACTION)
    assert choose_graph_form("auto", 2, U, I, bytes_per_cell=1, budget_bytes=big)
    assert not choose_graph_form(
        "auto", 2, U, I, bytes_per_cell=1, budget_bytes=small
    )


def test_budget_subtracts_state_and_admits_yelp_dense():
    """Round-5 calibration: the yelp shape (38,403×20,000, the largest
    reference catalog) MEASURED fitting the dense form on a 16 GiB v5e at
    2.2× the sparse epoch rate (sweeps/scale_probe_r5_yelp_*.json), but
    the old 0.25·limit budget refused it. The refined derivation
    (0.6·limit − explicit state estimate) must admit it on 16 GiB and
    still refuse it on 8 GiB."""
    from diffmm_tpu.train.coach import (
        choose_graph_form,
        dense_graph_budget_bytes,
        estimate_state_bytes,
    )

    class FakeDev:
        def __init__(self, limit):
            self._limit = limit

        def memory_stats(self):
            return {"bytes_limit": self._limit}

    U, I, m = 38403, 20000, 3
    state = estimate_state_bytes(
        m, U, I, latdim=64, hidden=[1024], d_emb_size=10,
        feat_dims=[128, 768, 128],
    )
    # denoiser 3-copy groups ≈ 1.44 GiB + GCN ≈ 0.04 + int8 store 0.72
    assert 2.0 * 2**30 < state < 2.6 * 2**30, state / 2**30
    big = dense_graph_budget_bytes(FakeDev(16 << 30), state_bytes=state)
    small = dense_graph_budget_bytes(FakeDev(8 << 30), state_bytes=state)
    assert choose_graph_form("auto", m, U, I, bytes_per_cell=1,
                             budget_bytes=big)
    assert not choose_graph_form("auto", m, U, I, bytes_per_cell=1,
                                 budget_bytes=small)


def test_dense_budget_gb_knob(tiny_config, tiny_data):
    """train.dense_budget_gb states the blocks budget when the backend
    reports no memory stats (this environment's tunnel TPU returns None);
    it must override the probe in BOTH directions."""
    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "auto"
    cfg.train.dense_budget_gb = 1.0
    assert Coach(cfg, tiny_data).dense_graphs
    cfg.train.dense_budget_gb = 1e-6  # ~1 KiB: below even the tiny blocks
    assert not Coach(cfg, tiny_data).dense_graphs


def test_int8_store_bit_identical_to_bf16(tiny_data):
    """int8-stored dense blocks convert to bf16 on the matmul read; 0/1 are
    exact in both dtypes, so forward results must be bit-identical while the
    stored block is half the bytes."""
    rows = jnp.asarray(tiny_data.train_rows)
    cols = jnp.asarray(tiny_data.train_cols)
    U, I = tiny_data.user_num, tiny_data.item_num
    d16 = build_dense_bi_adj_device(rows, cols, user_num=U, item_num=I,
                                    store_dtype=jnp.bfloat16)
    d8 = build_dense_bi_adj_device(rows, cols, user_num=U, item_num=I,
                                   store_dtype=jnp.int8)
    assert d8.mat.dtype == jnp.int8 and d16.mat.dtype == jnp.bfloat16
    rng = np.random.default_rng(3)
    xu = jnp.asarray(rng.standard_normal((U, 16)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((I, 16)).astype(np.float32))
    yu16, yi16 = spmm_bi(d16, xu, xi)
    yu8, yi8 = spmm_bi(d8, xu, xi)
    np.testing.assert_array_equal(np.asarray(yu8), np.asarray(yu16))
    np.testing.assert_array_equal(np.asarray(yi8), np.asarray(yi16))


def test_int4_store_bit_identical_to_int8(tiny_data):
    """Packed-int4 dense blocks are the same 0/1 values (exact in s4), so
    forward results must be bit-identical to the int8 store at a quarter of
    bf16's HBM bytes."""
    rows = jnp.asarray(tiny_data.train_rows)
    cols = jnp.asarray(tiny_data.train_cols)
    U, I = tiny_data.user_num, tiny_data.item_num
    d8 = build_dense_bi_adj_device(rows, cols, user_num=U, item_num=I,
                                   store_dtype=jnp.int8)
    d4 = build_dense_bi_adj_device(rows, cols, user_num=U, item_num=I,
                                   store_dtype=jnp.int4)
    assert d4.mat.dtype == jnp.int4
    np.testing.assert_array_equal(
        np.asarray(d4.mat, dtype=np.int8), np.asarray(d8.mat)
    )
    rng = np.random.default_rng(5)
    xu = jnp.asarray(rng.standard_normal((U, 16)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((I, 16)).astype(np.float32))
    yu8, yi8 = spmm_bi(d8, xu, xi)
    yu4, yi4 = spmm_bi(d4, xu, xi)
    np.testing.assert_array_equal(np.asarray(yu4), np.asarray(yu8))
    np.testing.assert_array_equal(np.asarray(yi4), np.asarray(yi8))


@pytest.mark.slow
def test_int4_falls_back_to_int8_without_backend_support(
    tiny_config, tiny_data, monkeypatch
):
    """Backends that can't pass s4 arrays across the jit boundary
    (observed: the axon-tunnel TPU — `RecursionError: Recursively calling
    jit` in `_array_shard_arg`) get a logged int8 fallback, not a crash
    mid-epoch. The capability probe is memoized; force its negative."""
    import jax.numpy as jnp

    from diffmm_tpu.train import coach as coach_mod

    monkeypatch.setattr(coach_mod, "_INT4_JIT_ARGS_OK", False)
    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "dense"
    cfg.train.dense_store = "int4"
    coach = Coach(cfg, tiny_data)
    assert coach.dense_store_dtype == jnp.int8
    assert coach.dense_store_bytes_per_cell == 1.0
    losses = coach.train_epoch(0)
    assert np.isfinite(losses["Loss"])


@pytest.mark.slow
def test_int4_epoch_runs(tiny_config, tiny_data):
    """A full train epoch + eval with the int4 store (exercises the jitted
    rebuild path that scatters int8 then narrows)."""
    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "dense"
    cfg.train.dense_store = "int4"
    coach = Coach(cfg, tiny_data)
    assert coach.dense_store_bytes_per_cell == 0.5
    losses = coach.train_epoch(0)
    assert np.isfinite(losses["Loss"])
    metrics = coach.test_epoch()
    assert 0.0 <= metrics["Recall"] <= 1.0


@pytest.mark.slow
def test_int4_mesh_epoch_runs(tiny_config, tiny_data):
    """int4 dense blocks shard over the (data, model) mesh like int8 — the
    catalog-dim slices stay packed per device."""
    from diffmm_tpu.parallel import make_mesh

    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "dense"
    cfg.train.dense_store = "int4"
    cfg.train.batch = 8
    cfg.train.test_batch = 8
    coach = Coach(cfg, tiny_data, mesh=make_mesh(8, model_parallel=2))
    losses = coach.train_epoch(0)
    assert np.isfinite(losses["Loss"])
    metrics = coach.test_epoch()
    assert 0.0 <= metrics["Recall"] <= 1.0


def test_dense_store_config_validated(tiny_config, tiny_data):
    cfg = copy.deepcopy(tiny_config)
    cfg.train.dense_store = "fp8"
    with pytest.raises(ValueError, match="dense_store"):
        Coach(cfg, tiny_data)


def test_budget_respects_bytes_per_cell():
    """int8 admission (4 graphs x 1 B + one 2 B temporary = 6 B/cell
    effective) covers shapes the bf16 form (8 B/cell) rejects."""
    from diffmm_tpu.train.coach import DENSE_GRAPH_BUDGET_BYTES, choose_graph_form

    u = 1 << 15
    i = DENSE_GRAPH_BUDGET_BYTES // (7 * u)  # between 6 and 8 B/cell
    assert choose_graph_form("auto", 3, u, i, bytes_per_cell=1)
    assert not choose_graph_form("auto", 3, u, i, bytes_per_cell=2)


def test_int8_budget_reserves_convert_temporary():
    """int8 'auto' admission reserves one transient bf16 operand copy in
    case XLA materializes the convert — a shape whose int8 storage alone
    fits but storage+temporary does not must stay sparse."""
    from diffmm_tpu.train.coach import DENSE_GRAPH_BUDGET_BYTES, choose_graph_form

    u = 1 << 15
    # (n_modal+1)=4 graphs at 1 B/cell + one 2 B/cell temporary = 6 B/cell
    i_fits = DENSE_GRAPH_BUDGET_BYTES // (6 * u) - 16
    i_edge = DENSE_GRAPH_BUDGET_BYTES // (4 * u) - 16  # storage-only math
    assert choose_graph_form("auto", 3, u, i_fits, bytes_per_cell=1)
    assert not choose_graph_form("auto", 3, u, i_edge, bytes_per_cell=1)
