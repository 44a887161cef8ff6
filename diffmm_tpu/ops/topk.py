"""Jittable per-user variable-k top-k for the epoch graph rebuild.

The reference rebuilds each modality's user-item graph with a triple Python
loop on host: for every user, ``torch.topk(denoised_row, k=user_degree)`` and
append the edges one by one (reference `Main.py:224-230`). The key structural
fact (SURVEY.md §7.2) making this jittable with static shapes:

    sum_u degree(u) = nnz(train)

so every epoch's rebuilt graph has *exactly* ``nnz`` edges, and because the
train matrix is fixed, each user's edges land at a *static* offset — the train
CSR ``indptr``. The rebuilt edge buffer therefore shares the main graph's
user-major CSR layout: positions ``indptr[u] : indptr[u+1]`` hold user ``u``'s
top-``degree(u)`` items.

Device algorithm per user block: one ``lax.top_k`` with the static bound
``k_max = max_u degree(u)``, mask lanes ``j >= degree(u)``, scatter item
indices to ``offset(u) + j`` (masked lanes drop via an out-of-range index).
Tie-breaking follows ``lax.top_k`` (lowest index wins on equal scores), which
matches `torch.topk`'s documented-unspecified ordering closely enough — the
reference itself does not define tie order (SURVEY.md §7.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_scatter_edges(
    scores: jax.Array,
    degrees: jax.Array,
    offsets: jax.Array,
    valid: jax.Array,
    k_max: int,
    buf_len: int,
    edge_buffer: jax.Array,
) -> jax.Array:
    """Scatter each user's top-``degree`` item indices into the edge buffer.

    Args:
      scores: (B, I) denoised scores for a block of users.
      degrees: (B,) int32 train degree of each user in the block.
      offsets: (B,) int32 CSR start offset of each user in the edge buffer.
      valid: (B,) bool, False for padding rows of the block.
      k_max: static per-dataset maximum user degree.
      buf_len: static buffer length (train nnz padded to the shard alignment;
        only the first nnz positions are ever written — pad lanes keep their
        item_num sentinel so they drop from the rebuilt adjacency).
      edge_buffer: (buf_len,) int32 buffer carried across user blocks.

    Returns:
      Updated (buf_len,) edge buffer of item indices (user ids are implicit in
      the CSR layout).
    """
    _, top_idx = jax.lax.top_k(scores, k_max)  # (B, k_max)
    lane = jnp.arange(k_max, dtype=jnp.int32)[None, :]
    keep = (lane < degrees[:, None]) & valid[:, None]
    # Invalid lanes target index buf_len (out of range) and are dropped.
    pos = jnp.where(keep, offsets[:, None] + lane, buf_len)
    return edge_buffer.at[pos.reshape(-1)].set(
        top_idx.astype(jnp.int32).reshape(-1), mode="drop"
    )
