"""Bipartite-graph propagation ops (TPU-native SpMM).

The reference keeps the symmetric-normalized bipartite adjacency
``D^-1/2 (A + I) D^-1/2`` over ``N = U + I`` nodes as a torch sparse COO tensor
(reference `DataHandler.py:68-93`) and multiplies it with dense embeddings via
`torch.sparse.mm` (reference `Model.py:90,111,130`).

Here the same operator is decomposed into a TPU-friendly static-shape form:

* The identity (self-loop) block is folded analytically: with
  ``S = diag(deg + 1)^-1/2`` (degree counts the self-loop, matching reference
  `DataHandler.py:62` where ``A + I`` row-sums are taken),

      y = S (A + I) S x = s * (A (s * x)) + s^2 * x.

  No scatter is needed for the diagonal at all.

* The off-diagonal blocks are the raw (binary) user-item edges, stored once as
  a user-major-sorted COO pair ``(ui_rows, ui_cols)`` plus a permutation that
  re-sorts the same edges item-major. Both directions of message passing are
  then `jax.ops.segment_sum` calls with ``indices_are_sorted=True``, which XLA
  lowers to an efficient one-pass segmented reduction instead of random-order
  scatter-adds.

* Normalization degrees live in two dense vectors ``s_user``/``s_item``; edges
  carry no values (the graphs are binary, reference `DataHandler.py:83`), so
  the whole adjacency is 3 int32 arrays + 2 small f32 arrays, rebuilt cheaply
  on device every epoch for the diffusion-regenerated modality graphs.

Embeddings stay split into user/item halves (the reference concatenates to a
single ``(N, d)`` tensor, `Model.py:89`; splitting avoids the concat/slice
round-trips entirely).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BiAdj(NamedTuple):
    """Normalized bipartite adjacency in folded static-shape form.

    Attributes:
      ui_rows: (nnz,) int32 user index per edge, sorted ascending.
      ui_cols: (nnz,) int32 item index per edge.
      iu_perm: (nnz,) int32 permutation such that ``ui_cols[iu_perm]`` is
        sorted ascending (item-major ordering of the same edges).
      s_user: (U,) f32 ``(deg_u + 1)^-1/2``.
      s_item: (I,) f32 ``(deg_i + 1)^-1/2``.
    """

    ui_rows: jax.Array
    ui_cols: jax.Array
    iu_perm: jax.Array
    s_user: jax.Array
    s_item: jax.Array
    # permutation back to user-major order from item-major order (inverse of
    # iu_perm up to ties) — used by the MXU-segsum custom VJP to run the
    # backward reduction sorted as well
    iu_inv: jax.Array | None = None
    # rank-space machinery for the ITEM-major layout (segsum.make_rank_aux:
    # per-edge dense ranks + rank->item inversion), hoisted here because it
    # is fixed per adjacency but consumed by every rank-space reduction in
    # the epoch (~0.43 + 1.13 ms per call on v5e/tiktok if recomputed
    # inline). Built on request (build_bi_adj_device(with_rank_aux=True))
    # for the diffusion-rebuilt modality graphs, whose dynamic item layout
    # only the rank-space plan can cover.
    rank_aux: Any = None

    @property
    def nnz(self) -> int:
        return self.ui_rows.shape[0]

    @property
    def user_num(self) -> int:
        return self.s_user.shape[0]

    @property
    def item_num(self) -> int:
        return self.s_item.shape[0]


def build_bi_adj_host(
    rows: np.ndarray, cols: np.ndarray, user_num: int, item_num: int
) -> BiAdj:
    """Build a :class:`BiAdj` on host from raw (binary) user-item edges.

    Duplicate edges must already be removed. Mirrors the normalization of
    reference `DataHandler.py:52-93` exactly (binary adjacency + identity,
    symmetric D^-1/2 normalization).

    Edge arrays may carry *sentinel padding* entries ``(user_num, item_num)``
    at the tail (added so the nnz axis is evenly shardable over a device
    mesh). Sentinels contribute nothing: segment_sum drops out-of-range
    scatter indices, and degree counting here excludes them explicitly.
    """
    order = np.argsort(rows, kind="stable")
    rows = np.asarray(rows, dtype=np.int32)[order]
    cols = np.asarray(cols, dtype=np.int32)[order]
    iu_perm = np.argsort(cols, kind="stable").astype(np.int32)
    iu_inv = np.empty_like(iu_perm)
    iu_inv[iu_perm] = np.arange(len(iu_perm), dtype=np.int32)
    deg_u = np.bincount(rows, minlength=user_num)[:user_num].astype(np.float64)
    deg_i = np.bincount(cols, minlength=item_num)[:item_num].astype(np.float64)
    s_user = ((deg_u + 1.0) ** -0.5).astype(np.float32)
    s_item = ((deg_i + 1.0) ** -0.5).astype(np.float32)
    return BiAdj(
        ui_rows=jnp.asarray(rows),
        ui_cols=jnp.asarray(cols),
        iu_perm=jnp.asarray(iu_perm),
        s_user=jnp.asarray(s_user),
        s_item=jnp.asarray(s_item),
        iu_inv=jnp.asarray(iu_inv),
    )


def build_bi_adj_device(
    ui_rows: jax.Array,
    ui_cols: jax.Array,
    user_num: int,
    item_num: int,
    rows_sorted: bool = True,
    with_rank_aux: bool = False,
) -> BiAdj:
    """Build a :class:`BiAdj` from device-resident edges (epoch graph rebuild).

    Replaces the host scipy round-trip of reference `Main.py:233-253` /
    `DataHandler.py:68-93`: degrees via segment_sum, item-major ordering via a
    single argsort — all on device, all static shapes.

    Sentinel padding entries ``(user_num, item_num)`` are tolerated: their
    out-of-range indices drop out of every segment_sum (degree counting here
    and message passing in :func:`spmm_bi`).
    """
    ones = jnp.ones_like(ui_rows, dtype=jnp.float32)
    deg_u = jax.ops.segment_sum(
        ones, ui_rows, num_segments=user_num, indices_are_sorted=rows_sorted
    )
    deg_i = jax.ops.segment_sum(ones, ui_cols, num_segments=item_num)
    s_user = jax.lax.rsqrt(deg_u + 1.0)
    s_item = jax.lax.rsqrt(deg_i + 1.0)
    iu_perm = jnp.argsort(ui_cols).astype(jnp.int32)
    iu_inv = jnp.argsort(iu_perm).astype(jnp.int32)
    rank_aux = None
    if with_rank_aux:
        from diffmm_tpu.ops.pallas.segsum import make_rank_aux

        rank_aux = make_rank_aux(ui_cols.take(iu_perm), item_num)
    return BiAdj(
        ui_rows=ui_rows.astype(jnp.int32),
        ui_cols=ui_cols.astype(jnp.int32),
        iu_perm=iu_perm,
        s_user=s_user,
        s_item=s_item,
        iu_inv=iu_inv,
        rank_aux=rank_aux,
    )


def spmm_bi(
    adj,
    x_user: jax.Array,
    x_item: jax.Array,
    mxu_segsum: tuple = (None, None),
    compute: str = "f32",
):
    """``y = D^-1/2 (A + I) D^-1/2 x`` on the split (user, item) embedding pair.

    Semantically identical to `torch.sparse.mm(adj, cat([x_u, x_i]))` of
    reference `Model.py:90` with the adjacency of `DataHandler.py:68-93`.

    Dispatches on the adjacency form: :class:`DenseBiAdj` -> MXU matmuls,
    :class:`BiAdj` -> sorted segment reductions. ``mxu_segsum`` carries an
    optional HOST-made plan per direction (user-major, item-major) selecting
    the one-hot-MXU sorted-segment-sum Pallas kernel
    (ops/pallas/segsum.py::make_segsum_plan, only valid for the static edge
    layout it was planned on); ``None`` -> the XLA scatter path.
    ``compute="bf16"`` rounds the per-edge messages to bf16 on the kernel
    paths (f32 accumulation) — the precision policy the dense form's MXU
    matmuls already apply to the same operand.

    Returns ``(y_user, y_item)`` with the same shapes as the inputs.
    """
    if isinstance(adj, DenseBiAdj):
        return _spmm_bi_dense(adj, x_user, x_item)
    z_u = x_user * adj.s_user[:, None]
    z_i = x_item * adj.s_item[:, None]
    u_plan, i_plan = mxu_segsum
    if (u_plan is not None or i_plan is not None) and adj.iu_inv is not None:
        # MXU path with a custom VJP: the backward of the edge gather is
        # itself a sorted reduction (via the opposite ordering), so no
        # XLA scatter appears in either pass.
        iu_rows = adj.ui_cols.take(adj.iu_perm)
        iu_cols = adj.ui_rows.take(adj.iu_perm)
        # reductions BY the item-major layout (m_u's backward, m_i's
        # forward) take the adjacency's hoisted rank machinery when their
        # plan is rank-space — single-device or mesh form (None aux ->
        # computed inline, still exact)
        from diffmm_tpu.ops.pallas.segsum import (
            RankedSegsumPlan as _RSP,
            ShardedRankedPlan as _SRP,
        )

        i_aux = adj.rank_aux if isinstance(i_plan, (_RSP, _SRP)) else None
        m_u = _propagate_sorted(
            z_i, adj.ui_rows, adj.ui_cols, adj.iu_perm, iu_rows,
            adj.user_num, adj.item_num, u_plan, i_plan, compute,
            bwd_aux=i_aux,
        )
        m_i = _propagate_sorted(
            z_u, iu_rows, iu_cols, adj.iu_inv, adj.ui_rows,
            adj.item_num, adj.user_num, i_plan, u_plan, compute,
            fwd_aux=i_aux,
        )
    else:
        # item -> user messages (edges already user-major sorted)
        m_u = jax.ops.segment_sum(
            z_i.take(adj.ui_cols, axis=0),
            adj.ui_rows,
            num_segments=adj.user_num,
            indices_are_sorted=True,
        )
        # user -> item messages (re-sorted item-major, one-pass reduce)
        iu_rows = adj.ui_cols.take(adj.iu_perm)
        iu_cols = adj.ui_rows.take(adj.iu_perm)
        m_i = jax.ops.segment_sum(
            z_u.take(iu_cols, axis=0),
            iu_rows,
            num_segments=adj.item_num,
            indices_are_sorted=True,
        )
    y_u = adj.s_user[:, None] * (m_u + z_u)
    y_i = adj.s_item[:, None] * (m_i + z_i)
    return y_u, y_i


class DenseBiAdj(NamedTuple):
    """The same normalized bipartite operator in dense MXU form.

    For small/medium catalogs the segment_sum SpMM is scatter-bound on TPU
    (~30x below HBM bandwidth); storing the binary interaction block as a
    (U, I) bf16 0/1 matrix turns both message-passing directions into MXU
    matmuls that stream at full bandwidth. Selected automatically when the
    dense block fits a budget (see train/coach.py); the BiAdj segment-sum
    path remains the general fallback for web-scale catalogs.

    Attributes:
      mat: (U, I) 0/1 interaction matrix (no normalization folded in);
        stored bf16, int8 or packed int4 (``train.dense_store`` — narrower
        moves fewer bytes, converted to bf16 at the matmul, identical math).
      s_user: (U,) f32 ``(deg_u + 1)^-1/2``.
      s_item: (I,) f32 ``(deg_i + 1)^-1/2``.
    """

    mat: jax.Array
    s_user: jax.Array
    s_item: jax.Array

    @property
    def user_num(self) -> int:
        return self.mat.shape[0]

    @property
    def item_num(self) -> int:
        return self.mat.shape[1]


def build_dense_bi_adj_device(
    ui_rows: jax.Array,
    ui_cols: jax.Array,
    user_num: int,
    item_num: int,
    rows_sorted: bool = True,
    store_dtype: Any = jnp.bfloat16,
) -> DenseBiAdj:
    """Dense-form adjacency from (possibly sentinel-padded) device edges.

    Sentinel entries (user_num, item_num) drop from both the scatter and the
    degree segment_sums. ``store_dtype``: HBM storage of the 0/1 block —
    int8 halves the bytes of every propagation pass (the matmul converts to
    bf16 on read; 0 and 1 are exact in both, so the math is bit-identical).
    """
    ones = jnp.ones_like(ui_rows, dtype=jnp.float32)
    deg_u = jax.ops.segment_sum(
        ones, ui_rows, num_segments=user_num, indices_are_sorted=rows_sorted
    )
    deg_i = jax.ops.segment_sum(ones, ui_cols, num_segments=item_num)
    # sub-byte stores scatter at byte width then narrow (scatter-into-s4
    # needs read-modify-write on packed nibbles; the one-shot convert is the
    # cheap, portable form)
    scatter_dtype = jnp.int8 if jnp.dtype(store_dtype) == jnp.int4 else jnp.dtype(store_dtype)
    mat = jnp.zeros((user_num, item_num), dtype=scatter_dtype)
    mat = mat.at[ui_rows, ui_cols].set(jnp.ones((), dtype=scatter_dtype), mode="drop")
    if scatter_dtype != store_dtype:
        mat = mat.astype(store_dtype)
    return DenseBiAdj(
        mat=mat,
        s_user=jax.lax.rsqrt(deg_u + 1.0),
        s_item=jax.lax.rsqrt(deg_i + 1.0),
    )


def _reduce_sorted(msgs, ids, n, plan, aux=None):
    """Sorted segment reduction: host-planned MXU kernel (single-device
    piecewise, rank-space, or mesh ``shard_map`` form, by plan type) or XLA
    scatter. Kernel forms accept bf16 messages and accumulate f32; the
    scatter fallback promotes to f32 first (segment_sum accumulates in the
    input dtype — bf16 accumulation would lose low bits per add)."""
    if plan is not None:
        from diffmm_tpu.ops.pallas.segsum import (
            RankedSegsumPlan,
            ShardedRankedPlan,
            ShardedSegsumPlan,
            ranked_segment_sum,
            sharded_ranked_segment_sum,
            sharded_sorted_segment_sum,
            sorted_segment_sum_planned,
        )

        if isinstance(plan, ShardedSegsumPlan):
            return sharded_sorted_segment_sum(msgs, ids, n, plan)
        if isinstance(plan, ShardedRankedPlan):
            return sharded_ranked_segment_sum(msgs, ids, n, plan, aux=aux)
        if isinstance(plan, RankedSegsumPlan):
            return ranked_segment_sum(msgs, ids, n, plan, aux=aux)
        return sorted_segment_sum_planned(msgs, ids, n, plan)
    if msgs.dtype != jnp.float32:
        msgs = msgs.astype(jnp.float32)
    return jax.ops.segment_sum(msgs, ids, num_segments=n, indices_are_sorted=True)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _get_propagator(n_out: int, n_src: int, fwd_plan, bwd_plan, compute: str):
    """One-direction edge propagation ``y[r] = sum_{rows[e]=r} z[cols[e]]``
    with a custom VJP: the gather's backward (normally an XLA scatter over
    nnz rows) is re-expressed as the SAME sorted reduction in the opposite
    ordering (``dz = reduce(ḡ[rows][perm] by cols-sorted)``), so neither
    pass contains a scatter when plans exist. Cached per static config so
    jit retraces reuse one custom_vjp object.

    ``compute="bf16"``: round the per-edge messages to bf16 before the
    gather (halving the (nnz, d) transient and running the kernel's one-hot
    dot at the MXU's bf16 rate; accumulation stays f32). This is the SAME
    rounding policy the dense graph form applies to its embedding operand
    (`_spmm_bi_dense` casts z to bf16 at the matmul) — the backward rounds
    the incoming cotangents symmetrically. ``z`` and the result stay f32 at
    the boundary either way."""
    import numpy as onp

    cast = (lambda a: a.astype(jnp.bfloat16)) if compute == "bf16" else (lambda a: a)

    @jax.custom_vjp
    def prop(z, rows, cols, perm, bwd_rows, fwd_aux, bwd_aux):
        msgs = cast(z).take(cols, axis=0)
        # sentinel pad lanes (rows == n_out) -> zero (OOB gathers fill NaN)
        msgs = jnp.where((rows < n_out)[:, None], msgs, 0.0)
        return _reduce_sorted(msgs, rows, n_out, fwd_plan, fwd_aux)

    def fwd(z, rows, cols, perm, bwd_rows, fwd_aux, bwd_aux):
        return (
            prop(z, rows, cols, perm, bwd_rows, fwd_aux, bwd_aux),
            (rows, cols, perm, bwd_rows, fwd_aux, bwd_aux),
        )

    def bwd(res, g):
        rows, cols, perm, bwd_rows, fwd_aux, bwd_aux = res
        # compose the two gathers (ḡ by rows, then by perm) into one (nnz,
        # d) float gather via the permuted int indices — the separate form
        # materializes an extra (nnz, d) transient per backward direction
        src_rows = rows.take(perm)
        dmsgs_s = cast(g).take(jnp.clip(src_rows, 0, n_out - 1), axis=0)
        dmsgs_s = jnp.where((src_rows < n_out)[:, None], dmsgs_s, 0.0)
        dmsgs_s = jnp.where((bwd_rows < n_src)[:, None], dmsgs_s, 0.0)
        dz = _reduce_sorted(dmsgs_s, bwd_rows, n_src, bwd_plan, bwd_aux)

        def f0(a):
            return onp.zeros(onp.shape(a), dtype=jax.dtypes.float0)

        return (
            dz, f0(rows), f0(cols), f0(perm), f0(bwd_rows),
            jax.tree.map(f0, fwd_aux), jax.tree.map(f0, bwd_aux),
        )

    prop.defvjp(fwd, bwd)
    return prop


def _propagate_sorted(
    z, rows, cols, perm, bwd_rows, n_out, n_src, fwd_plan, bwd_plan,
    compute: str = "f32", fwd_aux=None, bwd_aux=None,
):
    return _get_propagator(n_out, n_src, fwd_plan, bwd_plan, compute)(
        z, rows, cols, perm, bwd_rows, fwd_aux, bwd_aux
    )


@_functools.lru_cache(maxsize=None)
def _get_stacked_user_prop(M: int, n_out: int, n_src: int, wide_plan,
                           bwd_plan, compute: str):
    """User-direction propagation for M modality graphs that SHARE the
    static user-major edge layout (ops/topk.py: every rebuilt graph keeps
    the train CSR rows; only the item per slot differs) — ONE wide
    reduction at feature width M*d instead of M separate kernel calls.

    Measured A/B (sweeps/stacked_probe_r5.json, v5e/tiktok amortized-scan):
    3 separate planned reductions 0.581 ms vs one d=192 call 0.353 ms —
    the per-call fixed cost (one-hot chunk matmuls, window machinery) is
    paid once and reused across the stacked width. The backward reduces by
    each modality's OWN dynamic item-major layout (rank-space plan +
    per-adjacency hoisted aux), exactly like the per-modality propagator —
    stacking there LOSES (0.888 -> 1.17 ms: M*nnz edges overflow the
    VMEM-gated piece cap into the RMW path), so it stays per-modality.
    """
    import numpy as onp

    cast = (lambda a: a.astype(jnp.bfloat16)) if compute == "bf16" else (lambda a: a)

    @jax.custom_vjp
    def prop(z, rows, cols, perm, bwd_rows, bwd_aux):
        # z: (M, n_src, d); cols/perm/bwd_rows: (M, nnz); rows: (nnz,)
        d = z.shape[-1]
        msgs = jnp.concatenate(
            [cast(z[m]).take(cols[m], axis=0) for m in range(M)], axis=1
        )
        msgs = jnp.where((rows < n_out)[:, None], msgs, 0.0)
        wide = _reduce_sorted(msgs, rows, n_out, wide_plan)  # (n_out, M*d)
        return wide.reshape(n_out, M, d).transpose(1, 0, 2)

    def fwd(z, rows, cols, perm, bwd_rows, bwd_aux):
        return (
            prop(z, rows, cols, perm, bwd_rows, bwd_aux),
            (rows, cols, perm, bwd_rows, bwd_aux),
        )

    def bwd(res, g):
        rows, cols, perm, bwd_rows, bwd_aux = res
        dzs = []
        for m in range(M):
            src_rows = rows.take(perm[m])
            dmsgs = cast(g[m]).take(jnp.clip(src_rows, 0, n_out - 1), axis=0)
            dmsgs = jnp.where((src_rows < n_out)[:, None], dmsgs, 0.0)
            dmsgs = jnp.where((bwd_rows[m] < n_src)[:, None], dmsgs, 0.0)
            aux_m = jax.tree.map(lambda a: a[m], bwd_aux) if bwd_aux else None
            dzs.append(
                _reduce_sorted(dmsgs, bwd_rows[m], n_src, bwd_plan, aux_m)
            )

        def f0(a):
            return onp.zeros(onp.shape(a), dtype=jax.dtypes.float0)

        return (
            jnp.stack(dzs), f0(rows), f0(cols), f0(perm), f0(bwd_rows),
            jax.tree.map(f0, bwd_aux),
        )

    prop.defvjp(fwd, bwd)
    return prop


@_functools.lru_cache(maxsize=None)
def _get_multi_item_prop(M: int, n_out: int, n_src: int, fwd_plan,
                         wide_bwd_plan, compute: str):
    """Item-direction propagation for M modality graphs with the stacked
    BACKWARD: the forward reduces per modality (each has its own dynamic
    item-major layout — rank-space plans), but every backward reduces by
    the SHARED static user-major layout, so the M backward reductions run
    as ONE wide call at M*d (same measured 1.65x win as the forward
    stack in :func:`_get_stacked_user_prop`)."""
    import numpy as onp

    cast = (lambda a: a.astype(jnp.bfloat16)) if compute == "bf16" else (lambda a: a)

    @jax.custom_vjp
    def prop(z, rows, cols, perm, bwd_rows, fwd_aux):
        # z: (M, n_src, d); rows/cols/perm: (M, nnz); bwd_rows: (nnz,)
        outs = []
        for m in range(M):
            msgs = cast(z[m]).take(cols[m], axis=0)
            msgs = jnp.where((rows[m] < n_out)[:, None], msgs, 0.0)
            aux_m = jax.tree.map(lambda a: a[m], fwd_aux) if fwd_aux else None
            outs.append(_reduce_sorted(msgs, rows[m], n_out, fwd_plan, aux_m))
        return jnp.stack(outs)

    def fwd(z, rows, cols, perm, bwd_rows, fwd_aux):
        return (
            prop(z, rows, cols, perm, bwd_rows, fwd_aux),
            (rows, cols, perm, bwd_rows, fwd_aux),
        )

    def bwd(res, g):
        rows, cols, perm, bwd_rows, fwd_aux = res
        d = g.shape[-1]
        parts = []
        for m in range(M):
            src_rows = rows[m].take(perm[m])
            dmsgs = cast(g[m]).take(jnp.clip(src_rows, 0, n_out - 1), axis=0)
            dmsgs = jnp.where((src_rows < n_out)[:, None], dmsgs, 0.0)
            parts.append(dmsgs)
        dmsgs_w = jnp.concatenate(parts, axis=1)
        dmsgs_w = jnp.where((bwd_rows < n_src)[:, None], dmsgs_w, 0.0)
        wide = _reduce_sorted(dmsgs_w, bwd_rows, n_src, wide_bwd_plan)
        dz = wide.reshape(n_src, M, d).transpose(1, 0, 2)

        def f0(a):
            return onp.zeros(onp.shape(a), dtype=jax.dtypes.float0)

        return (
            dz, f0(rows), f0(cols), f0(perm), f0(bwd_rows),
            jax.tree.map(f0, fwd_aux),
        )

    prop.defvjp(fwd, bwd)
    return prop


def spmm_bi_modal_stacked(
    adjs: list,
    x_user: jax.Array,
    x_items: list,
    wide_plan,
    item_plan,
    compute: str = "f32",
):
    """All M modality propagations of `gcn_mm`'s modal loop in stacked
    form: ``(modal_u (M, U, d), modal_i (M, I, d))``, semantically equal to
    M independent :func:`spmm_bi` calls (same math per modality, reduction
    order within each wide kernel differs only like any replan does).

    Preconditions (asserted): every adjacency shares the SAME user-major
    ``ui_rows`` layout (the ops/topk.py rebuild invariant), and every
    adjacency carries ``iu_inv`` + hoisted ``rank_aux``. ``wide_plan`` is
    the static user-direction plan made at feature width ``M * d``
    (coach._stacked_gate); ``item_plan`` the rank-space plan (single-device
    or mesh form) the per-modality item reductions run under.
    """
    M = len(adjs)
    rows = adjs[0].ui_rows
    z_u = jnp.stack([x_user * a.s_user[:, None] for a in adjs])
    z_i = jnp.stack([x * a.s_item[:, None] for x, a in zip(x_items, adjs)])
    cols = jnp.stack([a.ui_cols for a in adjs])
    iu_rows = jnp.stack([a.ui_cols.take(a.iu_perm) for a in adjs])
    iu_cols = jnp.stack([a.ui_rows.take(a.iu_perm) for a in adjs])
    perm = jnp.stack([a.iu_perm for a in adjs])
    inv = jnp.stack([a.iu_inv for a in adjs])
    aux = None
    if adjs[0].rank_aux is not None:
        aux = tuple(
            jnp.stack([a.rank_aux[k] for a in adjs]) for k in range(3)
        )
    U, I = adjs[0].user_num, adjs[0].item_num
    m_u = _get_stacked_user_prop(M, U, I, wide_plan, item_plan, compute)(
        z_i, rows, cols, perm, iu_rows, aux
    )
    m_i = _get_multi_item_prop(M, I, U, item_plan, wide_plan, compute)(
        z_u, iu_rows, iu_cols, inv, rows, aux
    )
    s_u = jnp.stack([a.s_user for a in adjs])[:, :, None]
    s_i = jnp.stack([a.s_item for a in adjs])[:, :, None]
    return s_u * (m_u + z_u), s_i * (m_i + z_i)


def _use_dual_kernel(
    user_num: int, item_num: int, d: int, mat_itemsize: int = 2
) -> bool:
    """Trace-time gate for the fused dual-direction Pallas SpMM: TPU backend,
    working set fits VMEM; DIFFMM_SPMM=dual|two_pass overrides."""
    import os

    # Measured on v5e/tiktok (bf16 era): epoch time was a wash vs the two
    # XLA matmuls — the VMEM budget forced 128-row M blocks, whose per-step
    # overhead ate the halved adjacency traffic. Re-measured with int8
    # storage (2x the block at the same budget): 0.697 vs 0.564 s/epoch —
    # the XLA two-pass path with its fused int8 reads still wins, so the
    # default stays two_pass; DIFFMM_SPMM=dual opts the fused kernel in
    # (exact-parity tested, may win at other shapes).
    mode = os.environ.get("DIFFMM_SPMM", "two_pass")
    if mode != "dual":
        return False
    if jax.default_backend() in ("cpu",):
        # the compiled kernel only lowers on TPU; interpret mode is for tests
        return False
    from diffmm_tpu.ops.pallas.spmm_dual import dual_fits_vmem

    return dual_fits_vmem(user_num, item_num, d, mat_itemsize)


def _spmm_bi_dense(adj: DenseBiAdj, x_user: jax.Array, x_item: jax.Array):
    """Dense-form ``y = D^-1/2 (A + I) D^-1/2 x``: bf16 MXU matmuls with f32
    accumulation. The 0/1 matrix is exact in bf16; only the embeddings round
    to bf16 on the MXU input — the same rounding XLA's default-precision f32
    matmul applies.

    Two implementations, same math: the fused dual-direction Pallas kernel
    (one pass over the adjacency for both directions, fwd AND bwd —
    ops/pallas/spmm_dual.py) when it fits VMEM on TPU, else two XLA matmuls.
    """
    z_u32 = x_user * adj.s_user[:, None]
    z_i32 = x_item * adj.s_item[:, None]
    itemsize = adj.mat.dtype.itemsize
    if _use_dual_kernel(adj.user_num, adj.item_num, x_user.shape[1], itemsize):
        from diffmm_tpu.ops.pallas.spmm_dual import pick_tu, spmm_dual

        tu = pick_tu(adj.user_num, adj.item_num, x_user.shape[1], itemsize)
        m_u, m_i = spmm_dual(adj.mat, z_u32, z_i32, tu)
    else:
        # int8-stored blocks convert on read (0/1 exact in both dtypes —
        # identical results, half the HBM traffic of the dominant operand)
        mat = adj.mat
        if mat.dtype != jnp.bfloat16:
            mat = mat.astype(jnp.bfloat16)
        z_u = z_u32.astype(jnp.bfloat16)
        z_i = z_i32.astype(jnp.bfloat16)
        m_u = jax.lax.dot_general(
            mat, z_i, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_i = jax.lax.dot_general(
            mat, z_u, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y_u = adj.s_user[:, None] * (m_u + z_u32)
    y_i = adj.s_item[:, None] * (m_i + z_i32)
    return y_u, y_i


def bi_adj_to_dense(adj: BiAdj) -> jax.Array:
    """Densify the normalized (N, N) operator — test/debug helper only."""
    user_num, item_num = adj.user_num, adj.item_num
    n = user_num + item_num
    dense = jnp.zeros((n, n), dtype=jnp.float32)
    rows = adj.ui_rows
    cols = adj.ui_cols + user_num
    vals = adj.s_user[adj.ui_rows] * adj.s_item[adj.ui_cols]
    dense = dense.at[rows, cols].add(vals)
    dense = dense.at[cols, rows].add(vals)
    s = jnp.concatenate([adj.s_user, adj.s_item])
    diag = jnp.arange(n)
    dense = dense.at[diag, diag].add(s * s)
    return dense
