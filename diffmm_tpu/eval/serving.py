"""Serving: top-k recommendation from trained embeddings.

No reference counterpart (the reference never persists or serves a model —
SURVEY.md §5.4); this is the deployment surface of the framework: export the
final GCN embeddings once per model update, then answer per-user top-k
queries with one MXU matmul + `lax.top_k`, train items masked exactly like
eval (reference `Main.py:410` semantics).
"""

from __future__ import annotations

import threading
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Serializes FIRST-hit compiles of a (k, mask_seen, approx, batch) program
# variant: a threaded server (serve_http) dispatching concurrent cold
# requests would otherwise race XLA compilation of the same program —
# correct but pathological for tail latency (every racer pays the full
# compile). Warm variants dispatch lock-free.
_compile_lock = threading.Lock()
_compiled_variants: set[tuple] = set()


class RecIndex(NamedTuple):
    """Frozen model state for serving: final embeddings + train mask."""

    u_final: jax.Array  # (U, d)
    i_final: jax.Array  # (I, d)
    train_dense: jax.Array  # (U, I) int8 — mask of already-seen items


@partial(jax.jit, static_argnames=("k", "mask_seen", "approx"))
def _recommend_compiled(
    index: RecIndex, users: jax.Array, k: int, mask_seen: bool, approx: bool
) -> tuple[jax.Array, jax.Array]:
    u = index.u_final.take(users, axis=0)  # (B, d)
    scores = u @ index.i_final.T  # (B, I)
    if mask_seen:
        mask = index.train_dense.take(users, axis=0).astype(scores.dtype)
        scores = scores * (1.0 - mask) - mask * 1e8
    if approx:
        # TPU-native bucketed top-k (avoids the full sort network; recall
        # target 0.95 per bucket — the right trade for yelp-scale catalogs)
        top_scores, top_ids = jax.lax.approx_max_k(scores, k, recall_target=0.95)
    else:
        top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores


def recommend(
    index: RecIndex,
    users: jax.Array,
    k: int,
    mask_seen: bool = True,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-``k`` items (ids, scores) for a batch of user ids.

    ``k`` is validated and rounded up to the next power of two for the
    compiled top-k, then sliced back — a long-lived server fed
    client-supplied ``k`` values compiles at most ``log2(item_num)``
    variants per ``mask_seen`` instead of one per distinct ``k``.

    ``approx=True`` swaps the exact `lax.top_k` for TPU's hardware-bucketed
    `approx_max_k` (0.95 recall target) — worth it once the catalog is
    large enough that the sort network dominates the matmul.
    """
    item_num = int(index.i_final.shape[0])
    k = int(k)
    if not 1 <= k <= item_num:
        raise ValueError(f"k must be in [1, {item_num}], got {k}")
    k_pad = min(1 << (k - 1).bit_length(), item_num)
    # Warm/cold is decided by exactly what jax.jit keys its compile cache
    # on — input shapes/dtypes + the static args — NOT index identity: a
    # re-exported same-shape index hits the same compiled program, so it is
    # warm from the first request, and the variant set is bounded by the
    # number of distinct shapes a server ever sees (id()-based keys could
    # alias a dropped index via CPython id reuse and grew per export).
    variant = (
        jax.tree.map(lambda a: (a.shape, str(a.dtype)), tuple(index)),
        users.shape, str(users.dtype), k_pad, bool(mask_seen), bool(approx),
    )
    if variant not in _compiled_variants:
        with _compile_lock:
            top_ids, top_scores = _recommend_compiled(
                index, users, k_pad, bool(mask_seen), bool(approx)
            )
            _compiled_variants.add(variant)
    else:
        top_ids, top_scores = _recommend_compiled(
            index, users, k_pad, bool(mask_seen), bool(approx)
        )
    return top_ids[:, :k], top_scores[:, :k]


def warmup(
    index: RecIndex, ks: list[int] | None = None, approx: bool = False
) -> None:
    """Pre-compile the serving programs for the given ``k`` values (both
    mask modes, single-user batch) so no live request pays the first-hit
    XLA compile. One variant per power-of-two bucket actually compiles —
    :func:`recommend` rounds k up, so warming k=20 covers k in [17, 32]."""
    users = jnp.zeros((1,), dtype=jnp.int32)
    for k in ks or [20]:
        for mask_seen in (True, False):
            ids, scores = recommend(index, users, k, mask_seen, approx=approx)
            jax.block_until_ready(scores)


def build_index(coach, use_best: bool = True) -> RecIndex:
    """Freeze a trained Coach into a serving index (runs the GCN forward
    with the epoch's rebuilt modality graphs, like eval).

    ``use_best``: serve the best-test-Recall epoch's captured model
    (``Coach.capture_best`` — the reference's model-selection semantics,
    `Main.py:71-78`) instead of the final epoch's; the best epoch is
    frequently mid-run, so the final model is measurably worse. Falls back
    to the live state when no eval ever ran."""
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
    return RecIndex(
        u_final=u_final, i_final=i_final, train_dense=coach.data.train_dense
    )


def save_index(index: RecIndex, path: str) -> None:
    np.savez(
        path,
        u_final=np.asarray(index.u_final),
        i_final=np.asarray(index.i_final),
        train_dense=np.asarray(index.train_dense),
    )


def load_index(path: str) -> RecIndex:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    return RecIndex(
        u_final=jnp.asarray(data["u_final"]),
        i_final=jnp.asarray(data["i_final"]),
        train_dense=jnp.asarray(data["train_dense"]),
    )
