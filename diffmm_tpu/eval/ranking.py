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

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


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


@partial(jax.jit, static_argnames=("topk",))
def eval_batch(
    u_final: jax.Array,
    i_final: jax.Array,
    users: jax.Array,
    valid: jax.Array,
    train_dense: jax.Array,
    test_items: jax.Array,
    test_counts: jax.Array,
    cum_dcg: jax.Array,
    topk: int,
) -> EvalBatchSums:
    """Score one block of test users and return summed metrics.

    Args:
      u_final/i_final: (U, d)/(I, d) final GCN embeddings.
      users: (B,) test user ids (padded blocks carry arbitrary ids).
      valid: (B,) bool, False on padding rows.
      train_dense: (U, I) int8 train membership matrix (mask rows are
        gathered on device; reference streams dense rows via a DataLoader,
        `DataHandler.py:207-209`).
      test_items: (B, maxT) int32 test items, padded with -1.
      test_counts: (B,) int32 number of test items per user.
      cum_dcg: (topk+1,) ideal-DCG cumulative table from :func:`dcg_table`.
      topk: K.
    """
    train_mask_rows = train_dense.take(users, axis=0).astype(jnp.float32)
    u = u_final.take(users, axis=0)  # (B, d)
    scores = (u @ i_final.T) * (1.0 - train_mask_rows) - train_mask_rows * 1e8
    _, top_idx = jax.lax.top_k(scores, topk)  # (B, K)

    # membership: (B, maxT, K)
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


@partial(jax.jit, static_argnames=("topk",))
def eval_epoch(
    u_final: jax.Array,
    i_final: jax.Array,
    users_blocks: jax.Array,
    valid_blocks: jax.Array,
    train_dense: jax.Array,
    items_blocks: jax.Array,
    counts_blocks: jax.Array,
    cum_dcg: jax.Array,
    topk: int,
) -> jax.Array:
    """All eval blocks as one compiled scan; returns summed
    (recall, ndcg, precision). Block inputs carry a leading (n_blocks,) dim."""

    def body(acc, xs):
        users, valid, t_items, t_counts = xs
        out = eval_batch(
            u_final, i_final, users, valid, train_dense, t_items, t_counts,
            cum_dcg, topk,
        )
        return acc + jnp.stack(out), None

    acc0 = jnp.zeros((3,), dtype=jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc0, (users_blocks, valid_blocks, items_blocks, counts_blocks)
    )
    return acc
