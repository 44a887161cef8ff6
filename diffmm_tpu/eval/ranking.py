"""Full-catalog ranking evaluation: Recall@K / NDCG@K / Precision@K.

Parity targets:
  * scoring + masking + top-k — reference `Main.py:403-411`
    (``U @ I.T * (1 - mask) - mask * 1e8`` then ``torch.topk``);
  * metric math — reference `Main.py:422-448` (``calcRes``), which loops in
    Python per user; here it is a single vectorized membership computation:
    each test item matches at most one slot of the top-K list, so
    ``dcg = sum_{matches} 1 / log2(slot + 2)`` and the ideal DCG is a
    precomputed cumulative table indexed by ``min(|test_u|, K)``.

Metrics are summed per batch and divided by the total number of test users at
the end (reference `Main.py:413-419`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from diffmm_tpu.data.membership import TrainCSR, gather_item_lists, gather_rows
from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class EvalBatchSums(NamedTuple):
    recall: jax.Array
    ndcg: jax.Array
    precision: jax.Array


def dcg_table(topk: int) -> jax.Array:
    """``table[j] = sum_{loc < j} 1/log2(loc + 2)`` for j in [0, topk]."""
    gains = 1.0 / np.log2(np.arange(topk, dtype=np.float64) + 2.0)
    return jnp.asarray(
        np.concatenate([[0.0], np.cumsum(gains)]).astype(np.float32)
    )


def _plain_score_topk(u, i_final, train_store, users, topk):
    """Replicated scoring: mask train items, full-row top-k
    (reference `Main.py:403-411`). The mask rows come from the membership
    store — dense row gather or per-block CSR materialization, identical
    0/1 values (data/membership.py)."""
    mask = gather_rows(train_store, users, i_final.shape[0])
    scores = (u @ i_final.T) * (1.0 - mask) - mask * 1e8
    return jax.lax.top_k(scores, topk)[1]


def make_score_topk(topk: int, mesh: Mesh | None = None):
    """Build ``(u, i_final, train_store, users) -> (B, topk) global ids``.

    Without a mesh (or with a trivial model axis) this is the replicated
    full-catalog scoring above. On a mesh with model_parallel > 1 it is the
    explicit distributed top-k (SURVEY.md §2.3): inside a ``shard_map`` over
    the (data, model) grid each device scores its user block against ONLY its
    catalog shard — (B/dm, I/m), never a replicated (B, I) — takes a local
    ``top_k(k)``, offsets local ids to global, and an ``all_gather`` over the
    model axis merges the m·k candidates per user with one final small
    ``top_k``. The top-k of the union of per-shard top-ks equals the global
    top-k, so this is exact (candidate ties at the -1e8 mask floor can
    reorder, but masked = train items, which are never test items).

    ``train_store`` may be the dense (U, I) matrix (catalog columns sharded
    over the model axis) or a TrainCSR: then each user's O(k_max) item list
    is gathered OUTSIDE the shard_map and every shard scatters only the
    items landing in its catalog range into its local (B/dm, I/m) mask — no
    (B, I) array and no O(U·I) operand anywhere.
    """
    if mesh is None or mesh.shape[MODEL_AXIS] == 1:
        return lambda u, i_final, train_store, users: _plain_score_topk(
            u, i_final, train_store, users, topk
        )
    m = mesh.shape[MODEL_AXIS]

    def sharded(u, i_final, train_store, users):
        item_num = i_final.shape[0]
        if item_num % m or topk > item_num // m:
            # catalog not evenly divisible (or shards thinner than k):
            # fall back to the replicated form rather than pad
            return _plain_score_topk(u, i_final, train_store, users, topk)
        width = item_num // m
        is_csr = isinstance(train_store, TrainCSR)
        if is_csr:
            seen, valid = gather_item_lists(train_store, users)
            seen = jnp.where(valid, seen, jnp.int32(item_num))

        def local_mask_csr(b, i_loc, seen_blk):
            loc = seen_blk - jax.lax.axis_index(MODEL_AXIS) * width
            ok = (loc >= 0) & (loc < width)
            loc = jnp.where(ok, loc, width)  # out-of-shard -> dropped
            mask = jnp.zeros((b, width), jnp.float32)
            return mask.at[
                jnp.arange(b)[:, None], loc
            ].set(1.0, mode="drop")

        def local(u_blk, i_loc, seen_or_dense, users_blk):
            if is_csr:
                mask = local_mask_csr(u_blk.shape[0], i_loc, seen_or_dense)
            else:
                mask = seen_or_dense.take(users_blk, axis=0).astype(
                    jnp.float32
                )
            s = (u_blk @ i_loc.T) * (1.0 - mask) - mask * 1e8
            vals, idx = jax.lax.top_k(s, topk)  # (B/dm, k) local
            gidx = idx + jax.lax.axis_index(MODEL_AXIS) * width
            vals_all = jax.lax.all_gather(vals, MODEL_AXIS, axis=1, tiled=True)
            gidx_all = jax.lax.all_gather(gidx, MODEL_AXIS, axis=1, tiled=True)
            _, sel = jax.lax.top_k(vals_all, topk)  # merge m*k candidates
            return jnp.take_along_axis(gidx_all, sel, axis=1)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(DATA_AXIS, None),      # u: user block rows over data
                P(MODEL_AXIS, None),     # i_final: catalog rows over model
                # seen lists ride the data axis with their users; the dense
                # matrix shards its catalog columns over model
                P(DATA_AXIS, None) if is_csr else P(None, MODEL_AXIS),
                P(DATA_AXIS),            # users
            ),
            out_specs=P(DATA_AXIS, None),
            check_vma=False,
        )(u, i_final, seen if is_csr else train_store, users)

    return sharded


def _metric_sums(
    top_idx: jax.Array,
    valid: jax.Array,
    test_items: jax.Array,
    test_counts: jax.Array,
    cum_dcg: jax.Array,
    topk: int,
) -> EvalBatchSums:
    """Recall/NDCG/Precision sums from the global top-k ids
    (reference `Main.py:422-448` vectorized; see module docstring)."""
    match = (test_items[:, :, None] == top_idx[:, None, :]) & (
        test_items[:, :, None] >= 0
    )
    hits = jnp.sum(match.any(axis=2), axis=1).astype(jnp.float32)  # (B,)
    slot_gain = 1.0 / jnp.log2(jnp.arange(topk, dtype=jnp.float32) + 2.0)
    dcg = jnp.sum(match.astype(jnp.float32) * slot_gain[None, None, :], axis=(1, 2))

    counts = test_counts.astype(jnp.float32)
    max_dcg = cum_dcg[jnp.minimum(test_counts, topk)]
    w = valid.astype(jnp.float32)
    recall = jnp.sum(w * hits / jnp.maximum(counts, 1.0))
    ndcg = jnp.sum(w * dcg / jnp.maximum(max_dcg, 1e-12))
    precision = jnp.sum(w * hits / topk)
    return EvalBatchSums(recall=recall, ndcg=ndcg, precision=precision)


def make_eval_batch(topk: int, mesh: Mesh | None = None):
    """Build the jitted one-block eval: ``(u_final, i_final, users, valid,
    train_store, test_items, test_counts, cum_dcg) -> EvalBatchSums``.

    There is ONE scoring path — :func:`make_score_topk` — bound to the mesh
    at build time: replicated full-catalog scoring off-mesh, explicit
    distributed top-k when model_parallel > 1. (Previously a second,
    always-replicated module-level surface existed; a caller reaching for it
    on a mesh would silently materialize the (B, I) score matrix the
    distributed path exists to avoid.)

    Args of the built function:
      u_final/i_final: (U, d)/(I, d) final GCN embeddings.
      users: (B,) test user ids (padded blocks carry arbitrary ids).
      valid: (B,) bool, False on padding rows.
      train_store: (U, I) int8 train membership matrix or TrainCSR (mask
        rows materialize on device either way; reference streams dense rows
        via a DataLoader, `DataHandler.py:207-209`).
      test_items: (B, maxT) int32 test items, padded with -1.
      test_counts: (B,) int32 number of test items per user.
      cum_dcg: (topk+1,) ideal-DCG cumulative table from :func:`dcg_table`.
    """
    score_topk = make_score_topk(topk, mesh)

    @jax.jit
    def run(
        u_final, i_final, users, valid, train_store, test_items, test_counts,
        cum_dcg,
    ) -> EvalBatchSums:
        top_idx = score_topk(
            u_final.take(users, axis=0), i_final, train_store, users
        )
        return _metric_sums(
            top_idx, valid, test_items, test_counts, cum_dcg, topk
        )

    return run


def make_eval_epoch(topk: int, mesh: Mesh | None = None):
    """Build the jitted all-blocks eval program for a fixed topk/mesh:
    block inputs carry a leading (n_blocks,) dim, scanned in one compiled
    program; returns summed (recall, ndcg, precision). Per-block scoring
    goes through :func:`make_score_topk` (same single path as
    :func:`make_eval_batch`), so on a mesh with model_parallel > 1 no
    replicated (B, I) score matrix ever materializes."""
    score_topk = make_score_topk(topk, mesh)

    @jax.jit
    def run(
        u_final, i_final, users_blocks, valid_blocks, train_store,
        items_blocks, counts_blocks, cum_dcg,
    ):
        def body(acc, xs):
            users, valid, t_items, t_counts = xs
            top_idx = score_topk(
                u_final.take(users, axis=0), i_final, train_store, users
            )
            out = _metric_sums(top_idx, valid, t_items, t_counts, cum_dcg, topk)
            return acc + jnp.stack(out), None

        acc0 = jnp.zeros((3,), dtype=jnp.float32)
        acc, _ = jax.lax.scan(
            body, acc0, (users_blocks, valid_blocks, items_blocks, counts_blocks)
        )
        return acc

    return run
