"""Serving: top-k recommendation from trained embeddings.

No reference counterpart (the reference never persists or serves a model —
SURVEY.md §5.4); this is the deployment surface of the framework: export the
final GCN embeddings once per model update, then answer per-user top-k
queries with one MXU matmul + `lax.top_k`, train items masked exactly like
eval (reference `Main.py:410` semantics).

Scaling story (round 4): the index carries the train mask as user-major CSR
seen lists (O(nnz) memory — each request pads only its own batch to the max
user degree) instead of the dense (U, I) matrix, the on-disk export is the
same CSR (O(nnz) disk), and on a device
mesh with a non-trivial model axis the catalog embeddings stay
column-sharded — each request scores per shard and merges the m·k local
candidates with one small top-k (the same exact distributed pattern as
eval/ranking.py::make_score_topk), so no (B, I) score row nor (I, d)
catalog ever materializes on one device.
"""

from __future__ import annotations

import threading
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffmm_tpu.parallel.mesh import MODEL_AXIS

# Serializes FIRST-hit compiles of a program variant: a threaded server
# (serve_http) dispatching concurrent cold requests would otherwise race
# XLA compilation of the same program — correct but pathological for tail
# latency (every racer pays the full compile). Warm variants dispatch
# lock-free.
_compile_lock = threading.Lock()
_compiled_variants: set[tuple] = set()
# per-(mesh, topk-variant) jitted shard_map programs — a Mesh is hashable
_sharded_fns: dict[tuple, object] = {}


class RecIndex(NamedTuple):
    """Frozen model state for serving: final embeddings + train-seen lists.

    The seen lists are CSR (``seen_indptr``/``seen_indices``, user-major,
    int32 — fine to ~2B edges): **O(nnz) in memory**, like the training data
    itself. A padded (U, max_degree) table would be O(U·max_degree) — on
    power-law interaction data one heavy user inflates that U-fold — and the
    dense (U, I) mask it originally replaced was O(U·I). Requests expand
    only their own batch to the padded width (:func:`_gather_seen`).

    ``seen_width`` is the max user degree as a HOST int (``np.int32``) — the
    static pad width of the per-request gather; never read inside jit (it
    rides the pytree as an unused scalar)."""

    u_final: jax.Array  # (U, d)
    i_final: jax.Array  # (I, d) — catalog-sharded on a mesh
    seen_indptr: jax.Array  # (U + 1,) int32
    seen_indices: jax.Array  # (nnz,) int32, user-major
    seen_width: np.int32  # host scalar: max user degree (static gather pad)


def _index_fingerprint(index: RecIndex) -> tuple:
    """Compile-relevant identity of an index: array shapes/dtypes + the
    static gather width. Shared by the variant bookkeeping and tests."""
    arrays = (
        index.u_final, index.i_final, index.seen_indptr, index.seen_indices
    )
    return tuple((a.shape, str(a.dtype)) for a in arrays) + (
        int(index.seen_width),
    )


def _gather_seen(
    indptr: jax.Array,
    indices: jax.Array,
    users: jax.Array,
    width: int,
    item_num: int,
) -> jax.Array:
    """(B, width) train-item ids for the requested users, padded with
    ``item_num`` (dropped by the masking scatter): a per-request
    O(B·max_degree) transient gathered from the O(nnz) CSR."""
    if int(indices.shape[0]) == 0 or width == 0:
        return jnp.full(
            (users.shape[0], max(width, 1)), item_num, dtype=jnp.int32
        )
    starts = indptr.take(users)
    degs = indptr.take(users + 1) - starts
    offs = jnp.arange(width, dtype=jnp.int32)[None, :]
    pos = jnp.clip(starts[:, None] + offs, 0, indices.shape[0] - 1)
    return jnp.where(offs < degs[:, None], indices.take(pos), item_num)


def _mask_seen_scores(scores: jax.Array, seen: jax.Array) -> jax.Array:
    """Push each row's seen items below every real score (reference
    `Main.py:410` outcome: train items can never appear in the top-k).
    ``seen`` may contain out-of-range pads — dropped."""
    b = scores.shape[0]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    return scores.at[rows, seen].set(-1e9, mode="drop")


@partial(jax.jit, static_argnames=("k", "mask_seen", "approx", "seen_width"))
def _recommend_compiled(
    index: RecIndex,
    users: jax.Array,
    k: int,
    mask_seen: bool,
    approx: bool,
    seen_width: int,
) -> tuple[jax.Array, jax.Array]:
    u = index.u_final.take(users, axis=0)  # (B, d)
    scores = u @ index.i_final.T  # (B, I)
    if mask_seen:
        seen = _gather_seen(
            index.seen_indptr, index.seen_indices, users, seen_width,
            index.i_final.shape[0],
        )
        scores = _mask_seen_scores(scores, seen)
    if approx:
        # TPU-native bucketed top-k (avoids the full sort network; recall
        # target 0.95 per bucket — the right trade for yelp-scale catalogs)
        top_scores, top_ids = jax.lax.approx_max_k(scores, k, recall_target=0.95)
    else:
        top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores


def _make_recommend_sharded(
    mesh: Mesh,
    item_num: int,
    k: int,
    mask_seen: bool,
    approx: bool,
    seen_width: int,
):
    """Distributed per-request top-k: score each catalog shard locally,
    merge the m·k candidates (exact — the global top-k is contained in the
    union of per-shard top-ks; same argument as eval's make_score_topk)."""
    from jax import shard_map

    m = mesh.shape[MODEL_AXIS]
    width = item_num // m

    def local(u, i_loc, seen):
        s = u @ i_loc.T  # (B, I/m)
        off = jax.lax.axis_index(MODEL_AXIS) * width
        if mask_seen:
            local_ids = seen - off
            ok = (local_ids >= 0) & (local_ids < width)
            s = _mask_seen_scores(s, jnp.where(ok, local_ids, width))
        if approx:
            vals, idx = jax.lax.approx_max_k(s, k, recall_target=0.95)
        else:
            vals, idx = jax.lax.top_k(s, k)
        gidx = idx + off
        vals_all = jax.lax.all_gather(vals, MODEL_AXIS, axis=1, tiled=True)
        gidx_all = jax.lax.all_gather(gidx, MODEL_AXIS, axis=1, tiled=True)
        top_vals, sel = jax.lax.top_k(vals_all, k)
        return jnp.take_along_axis(gidx_all, sel, axis=1), top_vals

    @jax.jit
    def run(index: RecIndex, users: jax.Array):
        u = index.u_final.take(users, axis=0)
        seen = _gather_seen(
            index.seen_indptr, index.seen_indices, users, seen_width, item_num
        )
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, None), P(MODEL_AXIS, None), P(None, None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )(u, index.i_final, seen)

    return run


def recommend(
    index: RecIndex,
    users: jax.Array,
    k: int,
    mask_seen: bool = True,
    approx: bool = False,
    mesh: Mesh | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-``k`` items (ids, scores) for a batch of user ids.

    ``k`` is validated and rounded up to the next power of two for the
    compiled top-k, then sliced back — a long-lived server fed
    client-supplied ``k`` values compiles at most ``log2(item_num)``
    variants per ``mask_seen`` instead of one per distinct ``k``.

    ``approx=True`` swaps the exact `lax.top_k` for TPU's hardware-bucketed
    `approx_max_k` (0.95 recall target) — worth it once the catalog is
    large enough that the sort network dominates the matmul.

    ``mesh``: serve from a catalog-sharded index (see :func:`place_index`)
    with the exact distributed shard-and-merge top-k. Falls back to the
    replicated program when the model axis is trivial or the catalog does
    not divide it.
    """
    item_num = int(index.i_final.shape[0])
    k = int(k)
    if not 1 <= k <= item_num:
        raise ValueError(f"k must be in [1, {item_num}], got {k}")
    k_pad = min(1 << (k - 1).bit_length(), item_num)
    sharded = (
        mesh is not None
        and mesh.shape[MODEL_AXIS] > 1
        and item_num % mesh.shape[MODEL_AXIS] == 0
        and k_pad <= item_num // mesh.shape[MODEL_AXIS]
    )
    # Warm/cold is decided by exactly what jax.jit keys its compile cache
    # on — input shapes/dtypes + the static args — NOT index identity: a
    # re-exported same-shape index hits the same compiled program, so it is
    # warm from the first request, and the variant set is bounded by the
    # number of distinct shapes a server ever sees (id()-based keys could
    # alias a dropped index via CPython id reuse and grew per export).
    seen_width = int(index.seen_width)
    variant = (
        _index_fingerprint(index),
        users.shape, str(users.dtype), k_pad, bool(mask_seen), bool(approx),
        mesh if sharded else None,
    )
    if sharded:
        key = (
            mesh, item_num, k_pad, bool(mask_seen), bool(approx), seen_width
        )
        fn = _sharded_fns.get(key)
        if fn is None:
            fn = _make_recommend_sharded(mesh, item_num, *key[2:])
            _sharded_fns[key] = fn
        call = lambda: fn(index, users)
    else:
        call = lambda: _recommend_compiled(
            index, users, k_pad, bool(mask_seen), bool(approx), seen_width
        )
    if variant not in _compiled_variants:
        with _compile_lock:
            top_ids, top_scores = call()
            _compiled_variants.add(variant)
    else:
        top_ids, top_scores = call()
    return top_ids[:, :k], top_scores[:, :k]


def warmup(
    index: RecIndex,
    ks: list[int] | None = None,
    approx: bool = False,
    mesh: Mesh | None = None,
) -> None:
    """Pre-compile the serving programs for the given ``k`` values (both
    mask modes, single-user batch) so no live request pays the first-hit
    XLA compile. One variant per power-of-two bucket actually compiles —
    :func:`recommend` rounds k up, so warming k=20 covers k in [17, 32]."""
    users = jnp.zeros((1,), dtype=jnp.int32)
    for k in ks or [20]:
        for mask_seen in (True, False):
            ids, scores = recommend(
                index, users, k, mask_seen, approx=approx, mesh=mesh
            )
            jax.block_until_ready(scores)


def seen_csr_from_edges(
    rows: np.ndarray, cols: np.ndarray, user_num: int
) -> tuple[np.ndarray, np.ndarray, np.int32]:
    """Host-side user-major CSR train-item lists from raw edges:
    ``(indptr (U+1,), indices (nnz,), max_degree)`` — the O(nnz) in-memory
    form of the serving mask (no (U, max_degree) table is ever built)."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    deg = np.bincount(rows, minlength=user_num)[:user_num]
    order = np.argsort(rows, kind="stable")
    indices = np.asarray(cols)[order].astype(np.int32)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    width = np.int32(max(int(deg.max()) if deg.size else 1, 1))
    return indptr, indices, width


def place_index(index: RecIndex, mesh: Mesh | None) -> RecIndex:
    """Lay the index out for mesh serving: catalog rows of ``i_final`` over
    the model axis, everything else replicated (``u_final`` and the O(nnz)
    seen lists are row-addressed by arbitrary request users, so they stay
    whole). No-op without a non-trivial model axis."""
    if mesh is None or mesh.shape[MODEL_AXIS] == 1:
        return index
    item_num = int(index.i_final.shape[0])
    if item_num % mesh.shape[MODEL_AXIS]:
        return index
    rep = NamedSharding(mesh, P())
    return RecIndex(
        u_final=jax.device_put(index.u_final, rep),
        i_final=jax.device_put(
            index.i_final, NamedSharding(mesh, P(MODEL_AXIS, None))
        ),
        seen_indptr=jax.device_put(index.seen_indptr, rep),
        seen_indices=jax.device_put(index.seen_indices, rep),
        seen_width=index.seen_width,
    )


def build_index(coach, use_best: bool = True) -> RecIndex:
    """Freeze a trained Coach into a serving index (runs the GCN forward
    with the epoch's rebuilt modality graphs, like eval).

    ``use_best``: serve the best-test-Recall epoch's captured model
    (``Coach.capture_best`` — the reference's model-selection semantics,
    `Main.py:71-78`) instead of the final epoch's; the best epoch is
    frequently mid-run, so the final model is measurably worse. Falls back
    to the live state when no eval ever ran.

    On a mesh-backed Coach the returned index is already placed
    (catalog-sharded ``i_final``) — pass ``coach.mesh`` to
    :func:`recommend` to serve it distributed."""
    if use_best:
        params, modal_adjs = coach.best_state()
    else:
        modal_adjs = coach.ensure_modal_adjs()
        assert modal_adjs is not None, "train (or restore) before serving"
        params = coach.gcn_params
    u_final, i_final = coach.steps.gcn_forward(
        params, coach.data.adj, tuple(modal_adjs),
        coach.data.raw_feats, coach._hp(),
    )
    indptr, indices, width = seen_csr_from_edges(
        coach.host.train_rows, coach.host.train_cols, coach.host.user_num
    )
    index = RecIndex(
        u_final=u_final,
        i_final=i_final,
        seen_indptr=jnp.asarray(indptr),
        seen_indices=jnp.asarray(indices),
        seen_width=width,
    )
    return place_index(index, coach.mesh)


def save_index(index: RecIndex, path: str) -> None:
    """Export as npz with the train mask in CSR (indptr/indices) — O(nnz)
    on disk AND in memory; the dense (U, I) mask this replaces was O(U·I)."""
    np.savez(
        path,
        u_final=np.asarray(index.u_final),
        i_final=np.asarray(index.i_final),
        seen_indptr=np.asarray(index.seen_indptr),
        seen_indices=np.asarray(index.seen_indices),
    )


def load_index(path: str, mesh: Mesh | None = None) -> RecIndex:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    if "seen_indptr" in data:
        indptr = data["seen_indptr"].astype(np.int32)
        indices = data["seen_indices"].astype(np.int32)
        deg = np.diff(indptr)
        width = np.int32(max(int(deg.max()) if deg.size else 1, 1))
    else:  # pre-round-4 export with a dense (U, I) int8 mask
        rows, cols = np.nonzero(data["train_dense"])
        indptr, indices, width = seen_csr_from_edges(
            rows, cols, data["train_dense"].shape[0]
        )
    index = RecIndex(
        u_final=jnp.asarray(data["u_final"]),
        i_final=jnp.asarray(data["i_final"]),
        seen_indptr=jnp.asarray(indptr),
        seen_indices=jnp.asarray(indices),
        seen_width=width,
    )
    return place_index(index, mesh)
