"""MXU sorted-segment-sum kernel: parity (interpret mode) + the span gate."""

import jax
import jax.numpy as jnp
import numpy as np

from diffmm_tpu.data.loader import pad_edges
from diffmm_tpu.ops.pallas.segsum import sorted_segment_sum, spans_fit
import pytest


def test_matches_segment_sum_dense_ids(rng):
    ids = np.sort(rng.integers(0, 300, 2000)).astype(np.int32)
    msgs = rng.standard_normal((2000, 16)).astype(np.float32)
    got = np.asarray(
        sorted_segment_sum(jnp.asarray(msgs), jnp.asarray(ids), 300, chunk=128,
                           interpret=True)
    )
    want = np.asarray(
        jax.ops.segment_sum(jnp.asarray(msgs), jnp.asarray(ids), num_segments=300)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sentinel_pads_drop(rng):
    """EDGE_ALIGN-style sentinel pads (id == num_segments, zero msgs)."""
    ids = np.concatenate(
        [np.sort(rng.integers(0, 60, 200)), np.full(56, 60)]
    ).astype(np.int32)
    msgs = rng.standard_normal((256, 8)).astype(np.float32)
    msgs[200:] = 0.0
    got = np.asarray(
        sorted_segment_sum(jnp.asarray(msgs), jnp.asarray(ids), 60, chunk=64,
                           interpret=True)
    )
    want = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(msgs[:200]), jnp.asarray(ids[:200]), num_segments=60
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spans_fit_gate(rng):
    # dense sorted ids pass
    dense_ids = np.sort(rng.integers(0, 300, 2048)).astype(np.int32)
    assert spans_fit(dense_ids, 300, chunk=512)
    # huge gaps within a chunk fail
    gap_ids = np.sort(rng.choice(50000, 512, replace=False)).astype(np.int32)
    assert not spans_fit(gap_ids, 50000, chunk=512)
    # sentinel tail is exempt
    ids = np.concatenate([np.sort(rng.integers(0, 100, 700)), np.full(68, 100)])
    assert spans_fit(ids.astype(np.int32), 100, chunk=256)


def test_planned_matches_segment_sum(rng):
    """Tiled plan (multiple VMEM-sized pieces) == plain segment_sum."""
    from diffmm_tpu.ops.pallas.segsum import (
        make_segsum_plan,
        sorted_segment_sum_planned,
    )

    num_segments = 1000
    ids = np.sort(rng.integers(0, num_segments, 4000)).astype(np.int32)
    msgs = rng.standard_normal((4000, 8)).astype(np.float32)
    # force tiling by planning against a tiny fake budget via small chunk
    plan = make_segsum_plan(ids, num_segments, d=8, chunk=64)
    assert plan is not None
    # also exercise a hand-tiled plan with multiple pieces
    manual = []
    for lo in range(0, num_segments, 256):
        hi = min(lo + 256, num_segments)
        elo = int(np.searchsorted(ids, lo))
        ehi = int(np.searchsorted(ids, hi))
        manual.append((elo, ehi, lo, hi))
    got = np.asarray(
        sorted_segment_sum_planned(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments, tuple(manual),
            chunk=64, interpret=True,
        )
    )
    want = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments=num_segments
        )
    )
    assert got.shape == (num_segments, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_planned_executes_at_plan_chunk(rng):
    """ADVICE r4 regression: a plan built at a non-default chunk must
    execute at that chunk — the spans_fit window check is only valid
    there. This layout passes the check at chunk=1024 but drops edges if
    the kernel runs at the former default 512 (512-edge window spanning
    768 rows > the 512+128 one-hot window)."""
    from diffmm_tpu.ops.pallas.segsum import (
        make_segsum_plan,
        sorted_segment_sum_planned,
    )

    ids = []
    base = 0
    for _ in range(4):
        ids += [base] * 512  # dense stretch: span 1
        sparse = base + 1 + (np.arange(512) * 1.5).astype(np.int64)
        ids += sparse.tolist()  # sparse stretch: span 768
        base = ids[-1] + 1
    ids = np.asarray(ids, dtype=np.int32)
    num_segments = int(base)
    msgs = rng.standard_normal((len(ids), 8)).astype(np.float32)

    plan = make_segsum_plan(ids, num_segments, d=8, chunk=1024)
    assert plan is not None and plan.chunk == 1024
    # the same layout must NOT validate at 512 (the bug's execution chunk)
    assert make_segsum_plan(ids, num_segments, d=8, chunk=512) is None

    got = np.asarray(
        sorted_segment_sum_planned(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments, plan,
            interpret=True,
        )
    )
    want = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments=num_segments
        )
    )
    # 512-element f32 sums: accumulation order differs between the one-hot
    # dot and the scatter (observed ~2e-5 absolute) — a dropped dense
    # stretch would be off by O(sqrt(512)) ~ 20, far outside this band
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_planned_gradients(rng):
    from diffmm_tpu.ops.pallas.segsum import sorted_segment_sum_planned

    ids = np.sort(rng.integers(0, 100, 512)).astype(np.int32)
    msgs = jnp.asarray(rng.standard_normal((512, 8)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((100, 8)).astype(np.float32))
    elo1 = int(np.searchsorted(ids, 50))
    plan = ((0, elo1, 0, 50), (elo1, 512, 50, 100))

    def loss(m):
        out = sorted_segment_sum_planned(
            m, jnp.asarray(ids), 100, plan, chunk=64, interpret=True
        )
        return jnp.sum(out * cot)

    g = np.asarray(jax.grad(loss)(msgs))
    want = np.asarray(cot)[ids]
    np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-6)


def test_gate_on_real_shaped_edges(tiny_data):
    rows_p, cols_p = pad_edges(
        tiny_data.train_rows, tiny_data.train_cols,
        tiny_data.user_num, tiny_data.item_num,
    )
    assert spans_fit(rows_p, tiny_data.user_num)
    assert spans_fit(np.sort(cols_p), tiny_data.item_num)


# -------------------------------------------------------------- ranked form

def test_ranked_matches_segment_sum_with_gaps(rng):
    """Rank-space reduction == segment_sum for sorted ids WITH GAPS — the
    layout class (dynamic rebuilt modality item ids) the raw-id window
    check cannot admit."""
    from diffmm_tpu.ops.pallas.segsum import make_ranked_plan, ranked_segment_sum

    num_segments = 50_000  # huge id space, tiny edge count -> massive gaps
    ids = np.sort(rng.choice(num_segments, 2000, replace=False)).astype(np.int32)
    ids = np.repeat(ids, rng.integers(1, 4, 2000))[:4096]
    msgs = rng.standard_normal((len(ids), 8)).astype(np.float32)
    plan = make_ranked_plan(len(ids), d=8, chunk=128)
    assert plan is not None
    got = np.asarray(
        ranked_segment_sum(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments, plan,
            interpret=True,
        )
    )
    want = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments=num_segments
        )
    )
    assert got.shape == (num_segments, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ranked_multi_piece_and_sentinels(rng):
    """Pieces straddling a segment's edge run must ADD their partials; the
    sentinel tail (id == num_segments, zero msgs) contributes nothing."""
    from diffmm_tpu.ops.pallas.segsum import make_ranked_plan, ranked_segment_sum

    num_segments = 300
    real = np.sort(rng.integers(0, num_segments, 900)).astype(np.int32)
    ids = np.concatenate([real, np.full(124, num_segments, np.int32)])
    msgs = rng.standard_normal((1024, 8)).astype(np.float32)
    msgs[900:] = 0.0
    plan = make_ranked_plan(len(ids), d=8, chunk=64, max_edges_per_piece=200)
    assert plan is not None and len(plan.pieces) >= 5
    got = np.asarray(
        ranked_segment_sum(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments, plan,
            interpret=True,
        )
    )
    want = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(msgs[:900]), jnp.asarray(real), num_segments=num_segments
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_ranked_plan_in_sparse_coach(tiny_config, tiny_data, monkeypatch):
    """The sparse Coach must plan the rank-space reduction for the rebuilt
    modality item direction and keep the scatter trajectory (tolerance —
    the MXU accumulates in a different association order)."""
    import copy

    from diffmm_tpu.train.coach import Coach

    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "sparse"

    monkeypatch.setenv("DIFFMM_SEGSUM", "mxu")
    c_mxu = Coach(copy.deepcopy(cfg), tiny_data)
    assert c_mxu.modal_item_plan is not None, "modal item direction unplanned"
    r_mxu = c_mxu.train_epoch(0)
    e_mxu = c_mxu.test_epoch()

    monkeypatch.setenv("DIFFMM_SEGSUM", "xla")
    c_xla = Coach(copy.deepcopy(cfg), tiny_data)
    assert c_xla.modal_item_plan is None
    r_xla = c_xla.train_epoch(0)
    e_xla = c_xla.test_epoch()

    for k in r_xla:
        np.testing.assert_allclose(r_mxu[k], r_xla[k], rtol=2e-4, atol=2e-5)
    for k in e_xla:
        np.testing.assert_allclose(e_mxu[k], e_xla[k], rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------- mesh form

def _mesh8(model=2):
    from diffmm_tpu.parallel.mesh import make_mesh

    return make_mesh(8, model_parallel=model)


def test_sharded_matches_segment_sum(rng):
    """shard_map form == XLA segment_sum on the 8-virtual-device mesh,
    including a sentinel tail (zero messages, id == num_segments)."""
    from diffmm_tpu.ops.pallas.segsum import (
        make_sharded_segsum_plan,
        sharded_sorted_segment_sum,
    )
    from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = _mesh8()
    U, d, chunk = 300, 16, 128
    real = np.sort(rng.integers(0, U, 1000)).astype(np.int32)
    ids = np.concatenate([real, np.full(24, U, np.int32)])
    msgs = rng.standard_normal((len(ids), d)).astype(np.float32)
    msgs[1000:] = 0.0
    plan = make_sharded_segsum_plan(
        ids, U, d, mesh, (DATA_AXIS, MODEL_AXIS), chunk=chunk
    )
    assert plan is not None and plan.local_rows > 0
    got = np.asarray(
        sharded_sorted_segment_sum(jnp.asarray(msgs), jnp.asarray(ids), U, plan)
    )
    want = np.asarray(
        jax.ops.segment_sum(jnp.asarray(msgs[:1000]), jnp.asarray(real), num_segments=U)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_bf16_messages(rng):
    """bf16 messages through the mesh form (the `train.segsum_compute="bf16"`
    production setting): must not trip dynamic_update_slice's same-dtype
    requirement (the local frame follows the kernel's f32 ACCUMULATION dtype,
    not the message dtype) and must match a segment_sum over the same
    bf16-rounded messages."""
    from diffmm_tpu.ops.pallas.segsum import (
        make_sharded_segsum_plan,
        sharded_sorted_segment_sum,
    )
    from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = _mesh8()
    U, d, chunk = 300, 16, 128
    real = np.sort(rng.integers(0, U, 1000)).astype(np.int32)
    ids = np.concatenate([real, np.full(24, U, np.int32)])
    msgs = rng.standard_normal((len(ids), d)).astype(np.float32)
    msgs[1000:] = 0.0
    msgs_bf16 = jnp.asarray(msgs).astype(jnp.bfloat16)
    plan = make_sharded_segsum_plan(
        ids, U, d, mesh, (DATA_AXIS, MODEL_AXIS), chunk=chunk
    )
    assert plan is not None
    got = sharded_sorted_segment_sum(msgs_bf16, jnp.asarray(ids), U, plan)
    assert got.dtype == jnp.float32
    want = jax.ops.segment_sum(
        msgs_bf16[:1000].astype(jnp.float32), jnp.asarray(real),
        num_segments=U,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_sharded_plan_gates(rng):
    """Uneven edge counts and VMEM-oversized shard spans must refuse to plan
    (callers keep the XLA path) rather than mis-reduce."""
    from diffmm_tpu.ops.pallas.segsum import make_sharded_segsum_plan
    from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = _mesh8()
    axes = (DATA_AXIS, MODEL_AXIS)
    ids = np.sort(rng.integers(0, 100, 1001)).astype(np.int32)  # 1001 % 8 != 0
    assert make_sharded_segsum_plan(ids, 100, 16, mesh, axes) is None
    # one shard spanning far beyond the VMEM budget at d=512
    wide = np.sort(rng.integers(0, 10**6, 1024)).astype(np.int32)
    assert make_sharded_segsum_plan(wide, 10**6, 512, mesh, axes) is None


@pytest.mark.slow
def test_sparse_mesh_epoch_parity(tiny_config, tiny_data, monkeypatch):
    """VERDICT r2 #1: the sparse (web-scale) form on a mesh must run with
    non-None MXU plans — no silent fallback to XLA scatter — and match the
    single-device sparse trajectory (train metrics + eval)."""
    import copy

    from diffmm_tpu.train.coach import Coach

    monkeypatch.setenv("DIFFMM_SEGSUM", "mxu")
    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "sparse"

    c_mesh = Coach(copy.deepcopy(cfg), tiny_data, mesh=_mesh8())
    assert c_mesh.segsum_plans[0] is not None, "mesh run silently unplanned"
    assert c_mesh.segsum_plans[1] is not None
    # round-4 gap #2: the DYNAMIC modality item direction must also be
    # planned on the mesh (rank-space shard_map form), not XLA scatter
    from diffmm_tpu.ops.pallas.segsum import ShardedRankedPlan

    assert isinstance(c_mesh.modal_item_plan, ShardedRankedPlan), (
        "mesh sparse run regressed the modality item direction to scatter"
    )
    r_mesh = c_mesh.train_epoch(0)
    e_mesh = c_mesh.test_epoch()

    c_one = Coach(copy.deepcopy(cfg), tiny_data)
    assert c_one.segsum_plans != (None, None)
    r_one = c_one.train_epoch(0)
    e_one = c_one.test_epoch()

    for k in r_one:
        np.testing.assert_allclose(r_mesh[k], r_one[k], rtol=2e-4, atol=2e-5)
    for k in e_one:
        np.testing.assert_allclose(e_mesh[k], e_one[k], rtol=2e-4, atol=2e-5)


def test_vmem_budget_window():
    """Pin the 64 MB in-program scratch budget (round 4: an 84 MB piece
    ran standalone but crashed the TPU worker inside the joint program —
    the surrounding program's buffers share VMEM, so plans must leave
    headroom; ~127k rows at d<=128 per piece). A formula regression here
    silently multiplies plan piece counts or re-crashes at scale."""
    from diffmm_tpu.ops.pallas.segsum import (
        max_segments_in_vmem,
        segsum_fits_vmem,
    )

    assert 110_000 < max_segments_in_vmem(64) < 135_000
    # lane padding: d=64 and d=128 share one footprint
    assert max_segments_in_vmem(64) == max_segments_in_vmem(128)
    assert segsum_fits_vmem(120_000, 64)
    assert not segsum_fits_vmem(160_000, 64)


def test_plan_edge_budget(rng):
    """Pieces respect the per-piece edge cap (the HBM bound on the
    transient (E, d) gather); a single hub segment may exceed it alone."""
    from diffmm_tpu.ops.pallas.segsum import make_segsum_plan

    num_segments = 600
    ids = np.sort(rng.integers(0, num_segments, 10_000)).astype(np.int32)
    plan = make_segsum_plan(ids, num_segments, d=8, chunk=64,
                            max_edges_per_piece=1500)
    assert plan is not None and len(plan) >= 6
    assert plan.chunk == 64  # plan carries its validated execution chunk
    pieces = plan.pieces
    for edge_lo, edge_hi, seg_lo, seg_hi in pieces:
        assert seg_hi > seg_lo
        assert edge_hi - edge_lo <= 1500 or seg_hi - seg_lo == 1
    # contiguous, complete cover
    assert pieces[0][2] == 0 and pieces[-1][3] == num_segments
    assert all(a[3] == b[2] for a, b in zip(pieces, pieces[1:]))
    assert pieces[0][0] == 0 and pieces[-1][1] == len(ids)

    # hub segment: one segment with more edges than the budget
    hub = np.sort(
        np.concatenate([np.zeros(5000, np.int32),
                        rng.integers(1, 50, 500).astype(np.int32)])
    )
    plan = make_segsum_plan(hub, 50, d=8, chunk=64, max_edges_per_piece=1000)
    assert plan is not None
    assert plan.pieces[0][2] == 0 and plan.pieces[0][3] == 1  # the hub rides alone


def test_sharded_ranked_matches_segment_sum(rng):
    """Mesh rank-space form (ShardedRankedPlan) == XLA segment_sum on
    gap-bearing DYNAMIC layouts — single- and multi-piece, sentinel tail,
    ids straddling shard boundaries (psum merges the split-rank partials)."""
    from diffmm_tpu.ops.pallas.segsum import (
        make_sharded_ranked_plan,
        sharded_ranked_segment_sum,
    )
    from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = _mesh8()
    axes = (DATA_AXIS, MODEL_AXIS)
    num_segments = 300
    real = np.sort(rng.integers(0, num_segments, 968)).astype(np.int32)
    ids = np.concatenate([real, np.full(56, num_segments, np.int32)])
    msgs = rng.standard_normal((1024, 8)).astype(np.float32)
    msgs[968:] = 0.0
    want = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(msgs[:968]), jnp.asarray(real),
            num_segments=num_segments,
        )
    )
    for cap in (None, 40):  # single piece per shard / 4 pieces per shard
        plan = make_sharded_ranked_plan(
            len(ids), num_segments, 8, mesh, axes, chunk=64,
            max_edges_per_piece=cap,
        )
        assert plan is not None
        if cap:
            assert len(plan.pieces) >= 3
        got = np.asarray(
            sharded_ranked_segment_sum(
                jnp.asarray(msgs), jnp.asarray(ids), num_segments, plan,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_ranked_single_piece_fits_vmem():
    """Regression: a single-piece plan runs the kernel directly at
    local_rows, so local_rows itself must pass the VMEM gate. Before the
    fix, span + s + chunk sized it ~2x the validated cap whenever
    num_segments >= s (the web-scale regime the gate exists for)."""
    from diffmm_tpu.ops.pallas.segsum import (
        make_sharded_ranked_plan,
        max_segments_in_vmem,
        segsum_fits_vmem,
    )
    from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = _mesh8()
    axes = (DATA_AXIS, MODEL_AXIS)
    d, chunk = 64, 512
    cap = max_segments_in_vmem(d, chunk) - chunk
    # per-shard edges just under the cap; a huge catalog makes span == s
    nnz = (cap - chunk) * 8
    plan = make_sharded_ranked_plan(nnz, 2 * nnz, d, mesh, axes, chunk=chunk)
    assert plan is not None and len(plan.pieces) == 1
    assert segsum_fits_vmem(plan.local_rows, d, chunk), plan.local_rows


def test_sharded_ranked_hub_segment(rng):
    """One hub id owning several whole shards: every shard's partial for
    the shared rank lands on the same segment row and the psum adds them."""
    from diffmm_tpu.ops.pallas.segsum import (
        make_sharded_ranked_plan,
        sharded_ranked_segment_sum,
    )
    from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = _mesh8()
    axes = (DATA_AXIS, MODEL_AXIS)
    num_segments = 50
    ids = np.sort(
        np.concatenate([
            np.zeros(600, np.int32),  # hub: spans shards 0..4
            rng.integers(1, num_segments, 424).astype(np.int32),
        ])
    )
    msgs = rng.standard_normal((1024, 8)).astype(np.float32)
    plan = make_sharded_ranked_plan(len(ids), num_segments, 8, mesh, axes,
                                    chunk=64)
    got = np.asarray(
        sharded_ranked_segment_sum(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments, plan,
            interpret=True,
        )
    )
    want = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(msgs), jnp.asarray(ids), num_segments=num_segments
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
