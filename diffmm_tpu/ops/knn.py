"""KNN modality-graph ablation (reference C15, SURVEY.md §2.1).

The reference ships (commented out of the active path) an alternative to the
diffusion graph rebuild: per-user prototype = mean of the modality features of
the user's train items, cosine similarity against all item features, top-k
items per user (reference `Main.py:118-134`; numba kernels
`Utils/Utils.py:101-160`). Here it is one jitted program: prototypes via
segment_sum over the train edge list, a normalized (U, feat) @ (feat, I)
matmul on the MXU, and `lax.top_k` — no host loops, no numba.

Enabled with ``hyper.use_knn_adj = true`` (every epoch's modality adjacency
then comes from KNN instead of reverse diffusion).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from diffmm_tpu.ops.graph import BiAdj, build_bi_adj_device
from diffmm_tpu.ops.losses import l2_normalize


@partial(jax.jit, static_argnames=("user_num", "topk"))
def knn_edges(
    train_rows: jax.Array,
    train_cols: jax.Array,
    item_feats: jax.Array,
    user_num: int,
    topk: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-``topk`` most-similar items per user prototype.

    Args:
      train_rows/train_cols: (nnz',) train edges (sentinel padding allowed —
        out-of-range rows drop from the prototype sums).
      item_feats: (I, d) raw modality features.
      user_num: number of users (static).
      topk: edges per user (static, = ``hyper.knn_topk``).

    Returns:
      ``(rows, cols)`` of shape (user_num * topk,), user-major sorted.
    """
    feats = item_feats.astype(jnp.float32)
    gathered = feats.take(train_cols, axis=0)  # (nnz', d); OOB rows drop below
    proto_sum = jax.ops.segment_sum(
        gathered, train_rows, num_segments=user_num, indices_are_sorted=True
    )
    counts = jax.ops.segment_sum(
        jnp.ones_like(train_rows, dtype=jnp.float32),
        train_rows,
        num_segments=user_num,
        indices_are_sorted=True,
    )
    proto = proto_sum / jnp.maximum(counts, 1.0)[:, None]

    # cosine similarity == normalized dot product (the reference adds 1e-8 to
    # the norm product; sklearn's cosine_similarity clamps similarly)
    sim = l2_normalize(proto, axis=1) @ l2_normalize(feats, axis=1).T  # (U, I)
    _, top_idx = jax.lax.top_k(sim, topk)  # (U, topk)
    rows = jnp.repeat(
        jnp.arange(user_num, dtype=jnp.int32), topk, total_repeat_length=user_num * topk
    )
    cols = top_idx.astype(jnp.int32).reshape(-1)
    return rows, cols


def build_knn_adj(
    train_rows: jax.Array,
    train_cols: jax.Array,
    item_feats: jax.Array,
    user_num: int,
    item_num: int,
    topk: int,
) -> BiAdj:
    """KNN modality adjacency, normalized like every other graph
    (the reference routes its rebuilt edges through the same
    ``makeTorchAdj``, `Main.py:113-116`)."""
    rows, cols = knn_edges(train_rows, train_cols, item_feats, user_num, topk)
    return build_bi_adj_device(
        rows, cols, user_num=user_num, item_num=item_num, rows_sorted=True
    )
