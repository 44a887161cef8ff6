"""Train-interaction membership store: dense (U, I) matrix or O(nnz) CSR.

The reference materializes the FULL dense train matrix as a device tensor
and reads it everywhere (reference `DataHandler.py:128,211-228`): diffusion
rows, negative-sampling membership, the eval train-mask. The dense form is
the right call while it fits HBM — a row gather is one contiguous read —
but it caps the catalog at O(U·I) bytes, which is exactly the regime the
sparse graph form exists for (train/coach.py::choose_graph_form). This
module makes the membership representation polymorphic:

  * **dense** — a (U, I) int8 jax array, the round-1..4 behavior.
  * **csr** — :class:`TrainCSR`, three O(nnz)/O(U) arrays that ALREADY
    exist in :class:`~diffmm_tpu.data.loader.DeviceData` (the user-major
    sorted edge columns double as the CSR column stream), so the sparse
    form carries NO (U, I) array anywhere. Rows are materialized per block
    inside the jitted step (a (B, k_max) span gather + one (B, I) scatter —
    O(B·I) transient instead of O(U·I) resident), membership tests are
    per-lane binary searches over the user's sorted span, and eval masks
    build the same way per user block.

Both forms produce bit-identical 0/1 rows and membership bits, so training
trajectories are exactly interchangeable (tests/test_membership.py).

Every consumer dispatches at TRACE time on the store's Python type; jit
treats :class:`TrainCSR` as a pytree (k_max static), so the same step
functions compile for either form.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TrainCSR:
    """O(nnz) train membership: user-major sorted CSR.

    Attributes:
      cols: (nnz_pad,) int32 item ids, user-major sorted with ASCENDING
        items inside each user span (the loader's lexsort order —
        data/loader.py). May carry sentinel padding at the tail (never
        inside any span: ``offsets[u] + degrees[u] <= nnz``).
      offsets: (U,) int32 start of each user's span.
      degrees: (U,) int32 span lengths.
      k_max: static max user degree — bounds the span gather width and the
        binary-search depth.
    """

    cols: Any
    offsets: Any
    degrees: Any
    k_max: int


jax.tree_util.register_pytree_node(
    TrainCSR,
    lambda s: ((s.cols, s.offsets, s.degrees), s.k_max),
    lambda k_max, ch: TrainCSR(ch[0], ch[1], ch[2], k_max),
)


def is_csr(store: Any) -> bool:
    return isinstance(store, TrainCSR)


def gather_item_lists(store: TrainCSR, users: jax.Array):
    """Per-user item spans as a rectangular table.

    Returns ``(items, valid)``: (B, k_max) int32 item ids (arbitrary where
    invalid) and the (B, k_max) bool lane mask. Out-of-range user ids
    (edge-pad sentinels) clamp to the last user — callers mask those lanes
    themselves, matching the dense form's clamped row gather.
    """
    lanes = jnp.arange(store.k_max, dtype=jnp.int32)
    off = store.offsets.take(users)
    deg = store.degrees.take(users)
    pos = off[:, None] + lanes[None, :]
    valid = lanes[None, :] < deg[:, None]
    nnz = store.cols.shape[0]
    items = store.cols.take(jnp.minimum(pos, nnz - 1))
    return items, valid


def gather_rows(store: Any, users: jax.Array, item_num: int) -> jax.Array:
    """(B, item_num) f32 0/1 train rows for a user batch.

    Dense store: one contiguous row gather + cast (the int8 matrix is the
    resident). CSR store: span gather + ONE (B, item_num) scatter — the
    dense rows exist only as this block's transient, exactly the rows the
    reference's DiffusionData DataLoader would have streamed
    (reference `DataHandler.py:211-228`). Bit-identical outputs.
    """
    if not isinstance(store, TrainCSR):
        return store.take(users, axis=0).astype(jnp.float32)
    items, valid = gather_item_lists(store, users)
    b = users.shape[0]
    # invalid lanes -> item_num, dropped by the scatter's bounds check
    items = jnp.where(valid, items, jnp.int32(item_num))
    rows = jnp.zeros((b, item_num), jnp.float32)
    # NOT unique_indices: the dropped invalid lanes share index item_num
    return rows.at[jnp.arange(b)[:, None], items].set(1.0, mode="drop")


def contains(store: Any, users: jax.Array, items: jax.Array) -> jax.Array:
    """Per-lane membership test: is ``(users[e], items[e])`` a train edge?

    Dense store: one 2-D gather. CSR store: a fixed-depth lower-bound
    binary search over each user's sorted span (``bit_length(k_max)``
    iterations; every lane converges because span lengths are <= k_max).
    Same shapes in and out; out-of-range user ids clamp like the dense
    gather does.
    """
    if not isinstance(store, TrainCSR):
        return store[users, items] != 0
    lo = store.offsets.take(users)
    end = lo + store.degrees.take(users)
    n = store.cols.shape[0]
    n_iter = max(int(store.k_max).bit_length(), 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = store.cols.take(jnp.clip(mid, 0, n - 1))
        go_right = v < items
        active = lo < hi
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, n_iter, body, (lo, end))
    found = store.cols.take(jnp.clip(lo, 0, n - 1)) == items
    return (lo < end) & found


def make_train_csr(
    cols: jax.Array, offsets: jax.Array, degrees: jax.Array, k_max: int
) -> TrainCSR:
    """Assemble a store from the loader's existing device arrays — the CSR
    form allocates nothing new (``cols`` is DeviceData.train_cols)."""
    return TrainCSR(
        cols=cols, offsets=offsets, degrees=degrees, k_max=int(k_max)
    )
