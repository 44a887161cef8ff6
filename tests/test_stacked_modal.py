"""Parity of the stacked modal propagation (ops/graph.py::
spmm_bi_modal_stacked) against the per-modality spmm_bi loop — values AND
gradients, single-device and mesh plan forms, f32 and bf16 compute.

The stacked path exploits the rebuild invariant that every modality graph
shares the train-row user-major layout (ops/topk.py); these tests build
M adjacencies that way (same rows, different cols) and compare against
the loop the path replaces (models/gcn.py modal loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmm_tpu.data.loader import pad_edges
from diffmm_tpu.ops.graph import (
    build_bi_adj_device,
    spmm_bi,
    spmm_bi_modal_stacked,
)

U, I, D, M = 37, 29, 8, 3


def _adjs_shared_rows(rng, nnz=160):
    """M BiAdj sharing one sorted user-major row layout (the ops/topk.py
    rebuild invariant), each with its own item columns."""
    rows = np.sort(rng.integers(0, U, nnz).astype(np.int32))
    rows_p, _ = pad_edges(rows, rng.integers(0, I, nnz).astype(np.int32), U, I)
    adjs = []
    for _ in range(M):
        cols = rng.integers(0, I, nnz).astype(np.int32)
        _, cols_p = pad_edges(rows, cols, U, I)
        adjs.append(
            build_bi_adj_device(
                jnp.asarray(rows_p), jnp.asarray(cols_p), U, I,
                with_rank_aux=True,
            )
        )
    return rows_p, adjs


def _plans(rows_p, wide_d):
    from diffmm_tpu.ops.pallas.segsum import make_ranked_plan, make_segsum_plan

    user_plan = make_segsum_plan(rows_p, U, d=D, chunk=64)
    wide_plan = make_segsum_plan(rows_p, U, d=wide_d, chunk=64)
    item_plan = make_ranked_plan(len(rows_p), d=D, chunk=64)
    assert user_plan is not None and wide_plan is not None
    return user_plan, wide_plan, item_plan


@pytest.mark.parametrize("compute", ["f32", "bf16"])
def test_stacked_matches_loop_values_and_grads(rng, compute):
    rows_p, adjs = _adjs_shared_rows(rng)
    user_plan, wide_plan, item_plan = _plans(rows_p, M * D)
    x_user = jnp.asarray(rng.standard_normal((U, D), dtype=np.float32))
    feats = [jnp.asarray(rng.standard_normal((I, D), dtype=np.float32))
             for _ in range(M)]
    cot_u = jnp.asarray(rng.standard_normal((M, U, D), dtype=np.float32))
    cot_i = jnp.asarray(rng.standard_normal((M, I, D), dtype=np.float32))

    def loop(xu, fs):
        outs = [spmm_bi(a, xu, f, (user_plan, item_plan), compute)
                for a, f in zip(adjs, fs)]
        mu = jnp.stack([o[0] for o in outs])
        mi = jnp.stack([o[1] for o in outs])
        return jnp.vdot(mu, cot_u) + jnp.vdot(mi, cot_i)

    def stacked(xu, fs):
        mu, mi = spmm_bi_modal_stacked(
            adjs, xu, list(fs), wide_plan, item_plan, compute)
        return jnp.vdot(mu, cot_u) + jnp.vdot(mi, cot_i)

    v0, g0 = jax.value_and_grad(loop, argnums=(0, 1))(x_user, feats)
    v1, g1 = jax.value_and_grad(stacked, argnums=(0, 1))(x_user, feats)
    tol = 1e-5 if compute == "f32" else 2e-2
    np.testing.assert_allclose(v1, v0, rtol=tol, atol=tol)
    np.testing.assert_allclose(g1[0], g0[0], rtol=tol, atol=tol)
    for a, b in zip(g1[1], g0[1]):
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol)


def test_stacked_matches_xla_scatter(rng):
    """No-plan reference: the stacked outputs equal plain segment_sum
    propagation (spmm_bi with no plans) — catches any masking/sentinel
    error the planned comparison could share."""
    rows_p, adjs = _adjs_shared_rows(rng)
    _, wide_plan, item_plan = _plans(rows_p, M * D)
    x_user = jnp.asarray(rng.standard_normal((U, D), dtype=np.float32))
    feats = [jnp.asarray(rng.standard_normal((I, D), dtype=np.float32))
             for _ in range(M)]
    mu, mi = spmm_bi_modal_stacked(adjs, x_user, feats, wide_plan, item_plan)
    for m in range(M):
        ru, ri = spmm_bi(adjs[m], x_user, feats[m])
        np.testing.assert_allclose(mu[m], ru, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mi[m], ri, rtol=1e-5, atol=1e-5)


def test_gcn_mm_stacked_parity(rng):
    """gcn_mm with modal_wide_plan == gcn_mm without (full model forward +
    grads through the modal path)."""
    from diffmm_tpu.models.gcn import gcn_mm, init_gcn_params

    rows_p, adjs = _adjs_shared_rows(rng)
    user_plan, wide_plan, item_plan = _plans(rows_p, M * D)
    main = adjs[0]
    params = init_gcn_params(jax.random.PRNGKey(0), U, I, D, [D] * M)
    raw = [jnp.asarray(rng.standard_normal((I, D), dtype=np.float32))
           for _ in range(M)]

    def run(p, wide):
        out = gcn_mm(
            p, main, list(adjs), raw, modal_adj_weight=0.2,
            residual_weight=0.5,
            main_segsum=(user_plan, None),
            modal_segsum=(user_plan, item_plan),
            modal_wide_plan=wide,
        )
        return (jnp.sum(out.u_final ** 2) + jnp.sum(out.i_final ** 2)
                + jnp.sum(out.modal_u * out.modal_i.sum(1, keepdims=True)))

    v0, g0 = jax.value_and_grad(run)(params, None)
    v1, g1 = jax.value_and_grad(run)(params, wide_plan)
    np.testing.assert_allclose(v1, v0, rtol=1e-4, atol=1e-4)
    for k in g0:
        for a, b in zip(jax.tree.leaves(g1[k]), jax.tree.leaves(g0[k])):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_stacked_mesh_plans(rng):
    """Mesh plan forms (ShardedSegsumPlan wide + ShardedRankedPlan item)
    drive the same stacked propagator; parity vs the XLA scatter path on
    the 8-virtual-device mesh."""
    from diffmm_tpu.ops.pallas.segsum import (
        make_sharded_ranked_plan,
        make_sharded_segsum_plan,
    )
    from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh

    mesh = make_mesh(8, model_parallel=2)
    axes = (DATA_AXIS, MODEL_AXIS)
    rows_p, adjs = _adjs_shared_rows(rng)
    wide_plan = make_sharded_segsum_plan(rows_p, U, M * D, mesh, axes)
    item_plan = make_sharded_ranked_plan(len(rows_p), I, D, mesh, axes,
                                         chunk=64)
    assert wide_plan is not None and item_plan is not None
    x_user = jnp.asarray(rng.standard_normal((U, D), dtype=np.float32))
    feats = [jnp.asarray(rng.standard_normal((I, D), dtype=np.float32))
             for _ in range(M)]
    cot_u = jnp.asarray(rng.standard_normal((M, U, D), dtype=np.float32))
    cot_i = jnp.asarray(rng.standard_normal((M, I, D), dtype=np.float32))

    def stacked(xu, fs):
        mu, mi = spmm_bi_modal_stacked(
            adjs, xu, list(fs), wide_plan, item_plan)
        return jnp.vdot(mu, cot_u) + jnp.vdot(mi, cot_i), (mu, mi)

    def loop(xu, fs):
        outs = [spmm_bi(a, xu, f) for a, f in zip(adjs, fs)]
        mu = jnp.stack([o[0] for o in outs])
        mi = jnp.stack([o[1] for o in outs])
        return jnp.vdot(mu, cot_u) + jnp.vdot(mi, cot_i), (mu, mi)

    (v1, (mu1, mi1)), g1 = jax.value_and_grad(
        stacked, argnums=(0, 1), has_aux=True)(x_user, feats)
    (v0, (mu0, mi0)), g0 = jax.value_and_grad(
        loop, argnums=(0, 1), has_aux=True)(x_user, feats)
    np.testing.assert_allclose(mu1, mu0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(mi1, mi0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v1, v0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(g1[0], g0[0], rtol=1e-5, atol=1e-5)
    for a, b in zip(g1[1], g0[1]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
