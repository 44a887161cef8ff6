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
      k_cut: static head/tail lane split for :func:`gather_rows`. Degree
        distributions are power-law (tiktok: p95 = 3, max = 603), so
        padding EVERY user's span to k_max makes the per-block row scatter
        ~100× larger than the edges it writes — the round-5 interleaved
        A/B measured that padding as +155 ms/epoch fused, all of it in the
        row-building phases (sweeps/store_ab_r5.json; post-split +42 ms,
        sweeps/store_ab_r5_split.json). The
        split scatters k_cut lanes for everyone plus a (n_heavy, k_max)
        fixup for the few users with degree > k_cut (same positions, same
        value — bit-identical rows). k_cut == k_max disables the split.
      heavy_ids: (n_heavy,) int32 user ids with degree > k_cut, or None.
        Only its STATIC length reaches the compiled program (it caps the
        per-block fixup width); heavy rows are detected block-side from
        each row's own degree, so duplicate users within a block still get
        their full rows, and out-of-range pad lanes stay inert (their
        content is out of contract for both stores — callers mask pad
        rows, and the dense gather itself fill-values them).
    """

    cols: Any
    offsets: Any
    degrees: Any
    k_max: int
    k_cut: int = None  # type: ignore[assignment]  # None -> k_max (no split)
    heavy_ids: Any = None


jax.tree_util.register_pytree_node(
    TrainCSR,
    lambda s: (
        (s.cols, s.offsets, s.degrees, s.heavy_ids),
        (s.k_max, s.k_cut),
    ),
    lambda aux, ch: TrainCSR(ch[0], ch[1], ch[2], aux[0], aux[1], ch[3]),
)


def is_csr(store: Any) -> bool:
    return isinstance(store, TrainCSR)


def _span_lanes(cols: jax.Array, off: jax.Array, deg: jax.Array,
                lo: int, hi: int):
    """Items + lane mask for lanes ``[lo, hi)`` of each CSR span — the ONE
    clamped span gather every consumer shares (diffusion rows, eval masks,
    the heavy-tail fixup). Out-of-range positions clamp to the last edge;
    callers mask or scatter-drop the invalid lanes."""
    lanes = jnp.arange(lo, hi, dtype=jnp.int32)
    pos = off[:, None] + lanes[None, :]
    valid = lanes[None, :] < deg[:, None]
    nnz = cols.shape[0]
    items = cols.take(jnp.minimum(pos, nnz - 1))
    return items, valid


def gather_item_lists(store: TrainCSR, users: jax.Array):
    """Per-user item spans as a rectangular table.

    Returns ``(items, valid)``: (B, k_max) int32 item ids (arbitrary where
    invalid) and the (B, k_max) bool lane mask. Out-of-range user ids
    (edge-pad sentinels) clamp to the last user — callers mask those lanes
    themselves, matching the dense form's clamped row gather.
    """
    off = store.offsets.take(users)
    deg = store.degrees.take(users)
    return _span_lanes(store.cols, off, deg, 0, store.k_max)


def gather_rows(store: Any, users: jax.Array, item_num: int) -> jax.Array:
    """(B, item_num) f32 0/1 train rows for a user batch.

    Dense store: one contiguous row gather + cast (the int8 matrix is the
    resident). CSR store: span gather + ONE (B, item_num) scatter — the
    dense rows exist only as this block's transient, exactly the rows the
    reference's DiffusionData DataLoader would have streamed
    (reference `DataHandler.py:211-228`). With a head/tail plan
    (``k_cut < k_max``) the span gather runs at k_cut lanes for the whole
    block plus a (n_heavy, k_max − k_cut) fixup for the heavy users —
    ~8× fewer scattered lanes on power-law degrees, same written
    positions, same value: bit-identical outputs either way.
    """
    if not isinstance(store, TrainCSR):
        return store.take(users, axis=0).astype(jnp.float32)
    b = users.shape[0]
    k_cut = store.k_cut if store.k_cut is not None else store.k_max
    split = store.heavy_ids is not None and k_cut < store.k_max
    width = k_cut if split else store.k_max
    off = store.offsets.take(users)
    deg = store.degrees.take(users)
    items, valid = _span_lanes(store.cols, off, deg, 0, width)
    # invalid lanes -> item_num, dropped by the scatter's bounds check
    items = jnp.where(valid, items, jnp.int32(item_num))
    rows = jnp.zeros((b, item_num), jnp.float32)
    # NOT unique_indices: the dropped invalid lanes share index item_num
    rows = rows.at[jnp.arange(b)[:, None], items].set(1.0, mode="drop")
    if not split:
        return rows
    # Heavy fixup, block-side: each row knows from its own gathered degree
    # whether it needs tail lanes, so duplicate users get their full rows
    # and out-of-range pad lanes stay inert. Compact the heavy
    # row indices (ascending sort, pads = b last) and take the first
    # min(n_heavy, b) — callers' blocks hold distinct real users, so that
    # cap is exact for them; only pathological duplicate-heavy blocks could
    # exceed it, and earlier rows win (pad lanes sit at the block tail).
    h_cap = min(store.heavy_ids.shape[0], b)
    row_ids = jnp.arange(b, dtype=jnp.int32)
    rows_sel = jax.lax.sort(jnp.where(deg > k_cut, row_ids, jnp.int32(b)))[
        :h_cap
    ]
    # rows_sel == b (pad slots) clip on these gathers; their lanes are
    # dropped by the scatter's out-of-bounds row index below
    off_s = off.take(rows_sel, mode="clip")
    deg_s = deg.take(rows_sel, mode="clip")
    titems, tvalid = _span_lanes(store.cols, off_s, deg_s, k_cut, store.k_max)
    titems = jnp.where(tvalid, titems, jnp.int32(item_num))
    return rows.at[rows_sel[:, None], titems].set(1.0, mode="drop")


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


def plan_head_tail(degrees, k_max: int, block: int = 1024):
    """Pick the head/tail lane split for :func:`gather_rows` on the host.

    Minimizes scattered lanes per full user pass in blocks of ``block``:
    ``U·k + ceil(U/block)·H(k)·(k_max − k)`` with ``H(k)`` = #users of
    degree > k (the fixup runs every heavy user in every block — absent
    ones are dropped lanes but still scatter work). k sweeps powers of two;
    tiktok lands k_cut = 8 with 103 heavy users (8.2× fewer lanes than the
    k_max = 603 pad). Returns ``(k_cut, heavy_ids)``; ``k_cut == k_max``
    (uniform-degree data, tiny k_max) means no split.
    """
    import numpy as np

    deg = np.asarray(degrees)
    u = int(deg.shape[0])
    k_max = int(k_max)
    blocks = max(1, -(-u // int(block)))
    candidates = [k_max] + [
        1 << i for i in range(3, max(k_max.bit_length(), 4)) if (1 << i) < k_max
    ]
    best_k, best_cost = k_max, u * k_max
    for k in candidates:
        h = int((deg > k).sum())
        cost = u * k + blocks * h * (k_max - k)
        if cost < best_cost:
            best_k, best_cost = k, cost
    if best_k >= k_max:
        return k_max, None
    heavy_ids = np.flatnonzero(deg > best_k).astype(np.int32)
    return best_k, heavy_ids


def make_train_csr(
    cols: jax.Array,
    offsets: jax.Array,
    degrees: jax.Array,
    k_max: int,
    k_cut: int = None,  # type: ignore[assignment]
    heavy_ids=None,
) -> TrainCSR:
    """Assemble a store from the loader's existing device arrays — the CSR
    form allocates nothing new beyond the O(n_heavy) head/tail plan
    (``cols`` is DeviceData.train_cols)."""
    import numpy as np

    k_max = int(k_max)
    if heavy_ids is not None and k_cut is not None and int(k_cut) < k_max:
        heavy_ids = jnp.asarray(np.asarray(heavy_ids, dtype=np.int32))
        k_cut = int(k_cut)
    else:
        k_cut, heavy_ids = k_max, None
    return TrainCSR(
        cols=cols,
        offsets=offsets,
        degrees=degrees,
        k_max=k_max,
        k_cut=k_cut,
        heavy_ids=heavy_ids,
    )
