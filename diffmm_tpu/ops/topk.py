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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def topk_table(scores: jax.Array, k_max: int, impl: str = "approx") -> jax.Array:
    """Per-row top-``k_max`` item indices, value-sorted descending.

    ``impl="approx"`` uses ``lax.approx_max_k(recall_target=1.0)`` — the TPU
    PartialReduce custom call, measured 2.9 vs 3.7 ms for ``lax.top_k`` at
    (1024, 6710) k=603. With recall 1.0 the returned VALUES are identical to
    ``top_k`` and the output is value-sorted; index order differs only on
    exact float ties (measured 14 of 617k slots on gaussian scores), where
    the reference's ``torch.topk`` order is unspecified too
    (reference Main.py:224-230; SURVEY.md §7.3)."""
    if impl == "approx":
        _, idx = jax.lax.approx_max_k(scores, k_max, recall_target=1.0)
    elif impl == "exact":
        _, idx = jax.lax.top_k(scores, k_max)
    else:
        raise ValueError(f"rebuild_topk must be approx|exact, got {impl!r}")
    return idx.astype(jnp.int32)


class RebuildBucketPlan(NamedTuple):
    """Static host plan for the degree-ordered bucketed rebuild
    (``train.rebuild_order = "degree"``).

    Users are visited in degree-DESCENDING order and partitioned into
    contiguous ``batch``-sized blocks; blocks group into buckets, each with
    its own static top-k width = (pow2-rounded) max train degree within the
    bucket. On power-law degree distributions (tiktok p95 degree = 3, max =
    603) all but the leading bucket run a tiny top-k. The rebuild computes
    each user's row independently (reference `Main.py:211-253`), so order
    affects only which q-sample noise draw a user receives — and the
    reference's own rebuild iterates a ``shuffle=True`` DataLoader
    (reference `DataHandler.py:129`), i.e. its order is arbitrary too.

    ``user_blocks[b]`` is the bucket's ``(n_blocks_b, batch)`` int32 user
    ids (wrap-padded in the final block); ``widths[b]`` its static top-k
    width; ``row_starts[b]`` the first row of the bucket in the virtual
    stacked table (= cumulative padded user count); ``row_of_user`` maps a
    user id to its stacked-table row (degree-sort position).
    """

    user_blocks: tuple[np.ndarray, ...]
    widths: tuple[int, ...]
    row_starts: tuple[int, ...]
    row_of_user: np.ndarray


def plan_rebuild_buckets(
    degrees: np.ndarray,
    batch: int,
    item_num: int,
    small_cap: int = 32,
) -> RebuildBucketPlan:
    """Degree-descending two-bucket rebuild plan.

    The leading bucket takes the blocks that contain any user with degree >
    ``small_cap`` at the exact global ``k_max``; the tail bucket takes the
    rest at the pow2-rounded max degree of its own users. Two buckets (not
    one per distinct width) bound the number of distinct scan programs the
    fused multi-epoch compile has to build — each extra width is an extra
    XLA program, and tunnel compiles are the expensive resource.
    """
    degrees = np.asarray(degrees, dtype=np.int64)
    n = len(degrees)
    if n == 0:
        raise ValueError("plan_rebuild_buckets: degrees is empty")
    order = np.argsort(-degrees, kind="stable").astype(np.int32)
    n_blocks = max(1, -(-n // batch))
    padded = np.empty(n_blocks * batch, dtype=np.int32)
    padded[:n] = order
    # pad with the lightest user: its rows compute but are never gathered
    padded[n:] = order[-1]
    sorted_deg = np.zeros(n_blocks * batch, dtype=np.int64)
    sorted_deg[:n] = degrees[order]
    # blocks are contiguous slices of the degree-DESCENDING sort, so each
    # block's max is its first element and block_max is already
    # non-increasing — searchsorted on it directly finds the first block
    # whose every user (and every later block's) is "small"
    block_max = sorted_deg.reshape(n_blocks, batch)[:, 0]
    split = int(np.searchsorted(-block_max, -small_cap))  # block_max desc

    def width_for(max_deg: int) -> int:
        w = 1 << max(0, int(max_deg) - 1).bit_length()  # pow2 >= max_deg
        return int(min(max(w, max(1, int(max_deg))), item_num))

    blocks = padded.reshape(n_blocks, batch)
    buckets: list[tuple[np.ndarray, int]] = []
    if split > 0:
        buckets.append((blocks[:split], int(block_max[0])))
    if split < n_blocks:
        buckets.append((blocks[split:], width_for(block_max[split])))
    row_of_user = np.empty(n, dtype=np.int32)
    row_of_user[order] = np.arange(n, dtype=np.int32)
    row_starts, start = [], 0
    for blk, _ in buckets:
        row_starts.append(start)
        start += blk.size
    return RebuildBucketPlan(
        user_blocks=tuple(b for b, _ in buckets),
        widths=tuple(w for _, w in buckets),
        row_starts=tuple(row_starts),
        row_of_user=row_of_user,
    )


def make_csr_gather_layout(
    degrees: np.ndarray, buf_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static host-side layout for the gather-form CSR edge-buffer build.

    For CSR position ``p`` of user ``u`` (``offsets[u] <= p <
    offsets[u]+degrees[u]``): ``u_of_pos[p] = u``, ``lane_of_pos[p] = p -
    offsets[u]`` (< degree, so always a kept top-k lane). Pad positions
    (``p >= nnz``) gather row 0 lane 0 and are overwritten with the
    ``item_num`` sentinel via ``pad_mask``. Returns int32
    ``(u_of_pos, lane_of_pos, pad_mask)`` of length ``buf_len``."""
    degrees = np.asarray(degrees, dtype=np.int64)
    nnz = int(degrees.sum())
    assert nnz <= buf_len, (nnz, buf_len)
    u_of_pos = np.zeros(buf_len, dtype=np.int32)
    u_of_pos[:nnz] = np.repeat(
        np.arange(len(degrees), dtype=np.int32), degrees
    )
    offsets = np.cumsum(degrees) - degrees
    lane_of_pos = np.zeros(buf_len, dtype=np.int32)
    lane_of_pos[:nnz] = np.arange(nnz, dtype=np.int64) - offsets[u_of_pos[:nnz]]
    pad_mask = np.zeros(buf_len, dtype=bool)
    pad_mask[nnz:] = True
    return u_of_pos, lane_of_pos, pad_mask


def csr_gather_build(
    table: jax.Array,
    u_of_pos: jax.Array,
    lane_of_pos: jax.Array,
    pad_mask: jax.Array,
    item_num: int,
) -> jax.Array:
    """Build the user-major CSR edge buffer from a (U, k_max) top-index
    table by one static gather — the scatter-free form of
    :func:`topk_scatter_edges` for the identity-ordered epoch rebuild
    (measured: the per-block masked scatter cost 2.9 ms x 30 blocks/epoch;
    this is one sub-ms gather per modality per epoch). Pad lanes return the
    ``item_num`` sentinel so they drop from the rebuilt adjacency."""
    edges = table[u_of_pos, lane_of_pos]
    return jnp.where(pad_mask, jnp.int32(item_num), edges)


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
