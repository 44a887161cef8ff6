"""Per-user variable-k rebuild scatter vs a brute-force Python port of the
reference triple loop (reference `Main.py:224-230`)."""

import jax.numpy as jnp
import numpy as np

from diffmm_tpu.ops.topk import topk_scatter_edges
import pytest


def _brute_force(scores, degrees):
    """Reference semantics: per user, top-degree item indices in score order."""
    out = []
    for row, k in zip(scores, degrees):
        idx = np.argsort(-row, kind="stable")[:k]
        out.append(idx)
    return out


def test_scatter_matches_bruteforce(rng):
    U, I = 12, 20
    degrees = rng.integers(1, 8, size=U).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(degrees[:-1])]).astype(np.int32)
    nnz = int(degrees.sum())
    k_max = int(degrees.max())
    scores = rng.standard_normal((U, I)).astype(np.float32)

    buf = jnp.zeros(nnz, dtype=jnp.int32)
    buf = topk_scatter_edges(
        jnp.asarray(scores),
        jnp.asarray(degrees),
        jnp.asarray(offsets),
        jnp.ones(U, dtype=bool),
        k_max,
        nnz,
        buf,
    )
    got = np.asarray(buf)
    want = _brute_force(scores, degrees)
    for u in range(U):
        seg = got[offsets[u] : offsets[u] + degrees[u]]
        # same item set (tie order may differ; scores here are continuous so
        # exact order should match too)
        np.testing.assert_array_equal(np.sort(seg), np.sort(want[u]))


def test_padding_rows_do_not_write(rng):
    scores = rng.standard_normal((4, 10)).astype(np.float32)
    degrees = np.array([2, 3, 2, 3], dtype=np.int32)
    offsets = np.array([0, 2, 5, 7], dtype=np.int32)
    valid = np.array([True, True, False, False])
    nnz = 10
    buf = jnp.full(nnz, -7, dtype=jnp.int32)
    buf = topk_scatter_edges(
        jnp.asarray(scores), jnp.asarray(degrees), jnp.asarray(offsets),
        jnp.asarray(valid), 3, nnz, buf,
    )
    got = np.asarray(buf)
    assert (got[:5] != -7).all()  # users 0-1 wrote their spans
    assert (got[5:] == -7).all()  # masked users left the buffer untouched


def test_multi_block_accumulation(rng):
    """Carrying the buffer across user blocks covers all users exactly once."""
    U, I, B = 10, 15, 4
    degrees = rng.integers(1, 5, size=U).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(degrees[:-1])]).astype(np.int32)
    nnz = int(degrees.sum())
    k_max = int(degrees.max())
    scores = rng.standard_normal((U, I)).astype(np.float32)

    buf = jnp.full(nnz, -1, dtype=jnp.int32)
    idx = np.arange(((U + B - 1) // B) * B) % U
    valid_all = np.arange(len(idx)) < U
    for b in range(len(idx) // B):
        sl = slice(b * B, (b + 1) * B)
        users = idx[sl]
        buf = topk_scatter_edges(
            jnp.asarray(scores[users]),
            jnp.asarray(degrees[users]),
            jnp.asarray(offsets[users]),
            jnp.asarray(valid_all[sl]),
            k_max,
            nnz,
            buf,
        )
    assert (np.asarray(buf) >= 0).all()


def test_gather_build_matches_scatter(rng):
    """The round-3 gather-form CSR build == the scatter oracle for an
    identity-ordered full pass over all users (exact top-k)."""
    import jax.numpy as jnp

    from diffmm_tpu.ops.topk import (
        csr_gather_build,
        make_csr_gather_layout,
        topk_table,
    )

    U, I, k_max = 37, 23, 9
    degrees = rng.integers(1, k_max + 1, U).astype(np.int32)
    offsets = (np.cumsum(degrees) - degrees).astype(np.int32)
    nnz = int(degrees.sum())
    buf_len = nnz + (-nnz % 8)
    scores = jnp.asarray(rng.standard_normal((U, I)).astype(np.float32))

    # oracle: the block scatter over the same identity-ordered users
    buf = jnp.full((buf_len,), I, jnp.int32)
    buf = topk_scatter_edges(
        scores, jnp.asarray(degrees), jnp.asarray(offsets),
        jnp.ones((U,), bool), k_max, buf_len, buf,
    )

    table = topk_table(scores, k_max, impl="exact")
    u_of_pos, lane_of_pos, pad_mask = make_csr_gather_layout(degrees, buf_len)
    got = csr_gather_build(
        table, jnp.asarray(u_of_pos), jnp.asarray(lane_of_pos),
        jnp.asarray(pad_mask), I,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(buf))


def test_topk_table_approx_matches_exact_sets(rng):
    """approx (recall_target=1.0) selects the same top-k SET as exact and
    is value-sorted, so each user's top-``degree`` prefix selects the same
    items up to float ties (none here: continuous scores)."""
    import jax
    import jax.numpy as jnp

    from diffmm_tpu.ops.topk import topk_table

    scores = jnp.asarray(rng.standard_normal((16, 200)).astype(np.float32))
    a = topk_table(scores, 50, impl="approx")
    e = topk_table(scores, 50, impl="exact")
    v = np.asarray(scores)
    va = np.take_along_axis(v, np.asarray(a), axis=1)
    ve = np.take_along_axis(v, np.asarray(e), axis=1)
    np.testing.assert_array_equal(va, ve)  # same values in the same order
    # and every prefix (= per-user degree cut) selects the same value set
    for k in (1, 7, 50):
        np.testing.assert_array_equal(np.sort(va[:, :k]), np.sort(ve[:, :k]))


@pytest.mark.slow
def test_rebuild_compute_bf16(tiny_config, tiny_data):
    """train.rebuild_compute='bf16' changes ONLY the no-grad reverse-sampling
    compute: phase-1 diffusion training stays bit-identical f32, and the
    regenerated edge buffers agree with the f32 rebuild up to near-tie
    reordering (the buffers hold per-user top-degree item ids)."""
    import copy

    import jax
    import pytest

    from diffmm_tpu.train.coach import Coach

    cfg_a = copy.deepcopy(tiny_config)
    cfg_b = copy.deepcopy(tiny_config)
    cfg_b.train.rebuild_compute = "bf16"
    a = Coach(cfg_a, tiny_data)
    b = Coach(cfg_b, tiny_data)
    a.train_epoch(0)
    b.train_epoch(0)
    # phase 1 is untouched by the rebuild dtype: denoiser params identical
    for pa, pb in zip(a.dn_params, b.dn_params):
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)
            ),
            pa,
            pb,
        )
    # the rebuilt graphs agree except where bf16 matmul noise reorders
    # near-tied candidates at each user's degree cut
    for ba, bb in zip(a.edge_buffers, b.edge_buffers):
        overlap = np.mean(np.asarray(ba) == np.asarray(bb))
        assert overlap > 0.85, overlap

    cfg_c = copy.deepcopy(tiny_config)
    cfg_c.train.rebuild_compute = "fp8"
    with pytest.raises(ValueError, match="rebuild_compute"):
        Coach(cfg_c, tiny_data)
