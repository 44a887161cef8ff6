"""Sorted segment-sum on the MXU — the TPU-native SpMM reduction.

XLA lowers `jax.ops.segment_sum` to scatter-adds, which serialize on TPU
(measured ~30x under HBM bandwidth — DESIGN.md). For *sorted* segment ids —
exactly what the bipartite edge lists provide in both directions — the
reduction can instead be computed chunk-by-chunk with a one-hot MXU matmul:

  for each chunk of E consecutive edges (sorted by segment id):
      local   = seg_ids - seg_ids[0]            # in [0, E): <= E distinct
                                                #   segments per E sorted edges
      onehot  = (local[:, None] == iota(E))     # (E, E)
      partial = onehotᵀ @ msgs_chunk            # (E, d) on the MXU
      acc[seg_ids[0] : seg_ids[0] + E] += partial

The accumulator lives whole in a VMEM *scratch* buffer across the
sequential grid (declared output stays in HBM and receives ONE explicit
DMA at the last grid step), so the dynamic-slice accumulation is a cheap
on-chip read-modify-write. Versus the earlier pipeline-managed VMEM output
window this measured 1.3x faster at equal size (bit-identical results) and
— with `vmem_limit_bytes` raised to the buffer's actual footprint — scales
to >=160k segment rows at d=64 (82 MB scratch on v5e's 128 MB VMEM; the
Mosaic default limit otherwise caps scratch at ~15.5 MB lane-padded).
Applies when `(num_segments, round_up(d, 128))` f32 fits that budget — the
regime where the dense (U, I) graph form does NOT fit HBM but the
embedding tables easily fit on-chip (e.g. yelp-scale catalogs).

Padding contract (matches ops/graph.py sentinels): pad edges carry
seg_id == num_segments and zero messages, so they add nothing wherever the
clamped slice lands.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

from diffmm_tpu.ops.pallas import round_up as _round_up

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Accumulator-window alignment granularity. The per-chunk read-modify-write
# of the VMEM scratch at a DYNAMIC row offset is the kernel's dominant cost
# when the offset is arbitrary: Mosaic lowers unaligned dynamic sublane
# slices through a shift path (measured 4.3 µs/chunk — ~78% of the whole
# kernel at tiktok shape). Rounding the window start down to a 128-row
# boundary widens the one-hot by 128 lanes but turns the slice into an
# aligned access: measured 0.567 -> 0.122 ms per reduction (4.6x) at
# nnz=59904, d=64, chunk=512 on v5e. 8-row (sublane-tile) alignment is NOT
# sufficient — measured no speedup; 128 is the first granularity on the
# fast path.
_WINDOW_ALIGN = 128


def _segsum_kernel(rows_ref, msgs_ref, out_ref, acc_ref, sem):
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    rows = rows_ref[:, 0]  # (E,) sorted segment ids of this chunk
    E = rows.shape[0]
    # window start, _WINDOW_ALIGN-aligned. The slack W gains over the raw
    # chunk size MUST equal the alignment granularity: a start rounded down
    # by up to (_WINDOW_ALIGN - 1) rows pushes local ids up by the same
    # amount, and only the widened one-hot keeps them in range.
    u0 = (rows[0] // _WINDOW_ALIGN) * _WINDOW_ALIGN
    W = E + _WINDOW_ALIGN
    local = rows - u0  # in [0, W) for real edges; >= W for far-off pads
    # Precision note (measured on v5e): the MXU lowers this f32 dot through
    # its bf16 pipeline, so messages are bf16-rounded with f32 accumulation
    # — identical to a segment_sum over bf16-rounded inputs, and the same
    # rounding policy the dense graph form applies to its embedding operand.
    # Interpret mode (CPU tests) computes exact f32. Explicitly casting the
    # inputs to bf16 here measured SLOWER (0.171 vs 0.122 ms — the convert
    # op costs more than it saves), so the cast is left to the MXU.
    onehot = (
        local[:, None] == jax.lax.broadcasted_iota(jnp.int32, (E, W), 1)
    ).astype(msgs_ref.dtype)
    partial = jax.lax.dot_general(
        onehot,
        msgs_ref[:, :],
        (((0,), (0,)), ((), ())),  # onehotᵀ @ msgs -> (W, d)
        preferred_element_type=jnp.float32,
    )
    cur = acc_ref[pl.ds(u0, W), :]
    acc_ref[pl.ds(u0, W), :] = cur + partial

    @pl.when(c == nc - 1)
    def _():
        cp = pltpu.make_async_copy(acc_ref, out_ref, sem)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit, static_argnames=("num_segments", "chunk", "interpret")
)
def _sorted_segment_sum_impl(
    msgs: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    nnz, d = msgs.shape
    nnz_p = _round_up(nnz, chunk)
    msgs_p = jnp.pad(msgs, ((0, nnz_p - nnz), (0, 0)))
    ids_p = jnp.pad(
        seg_ids.astype(jnp.int32), (0, nnz_p - nnz),
        constant_values=num_segments,
    ).reshape(nnz_p, 1)
    # accumulator over-allocated by one (aligned) window so the dynamic
    # slice never clamps real rows; pad-chunk contributions land in the
    # tail and are dropped
    out_rows = _round_up(num_segments + chunk + _WINDOW_ALIGN, 8)
    # Mosaic's default scoped-VMEM limit caps scratch at ~15.5 MB
    # (lane-padded); raise it to this call's measured footprint so the
    # accumulator can use the chip's full VMEM (see segsum_fits_vmem)
    vmem_limit = _segsum_vmem_bytes(out_rows, d, chunk) + 2 * 1024 * 1024

    out = pl.pallas_call(
        _segsum_kernel,
        grid=(nnz_p // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda c: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((out_rows, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((out_rows, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(vmem_limit, 110 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nnz_p * (chunk + _WINDOW_ALIGN) * d,
            bytes_accessed=nnz_p * (d + 1) * 4 + out_rows * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids_p, msgs_p)
    return out[:num_segments]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_segment_sum(
    msgs: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """segment_sum for ASCENDING ``seg_ids`` via one-hot MXU matmuls.

    Args:
      msgs: (nnz, d) f32 messages; rows whose seg_id is out of range MUST be
        zero (they may still be accumulated into a clamped slice).
      seg_ids: (nnz,) int32 sorted ascending; out-of-range == padding.
      num_segments: output rows.

    The VJP is a plain gather (``dmsgs[e] = ḡ[seg_ids[e]]``) — no kernel
    needed on the backward path.
    """
    return _sorted_segment_sum_impl(
        msgs, seg_ids, num_segments, chunk=chunk, interpret=interpret
    )


def _ssum_fwd(msgs, seg_ids, num_segments, chunk, interpret):
    out = _sorted_segment_sum_impl(
        msgs, seg_ids, num_segments, chunk=chunk, interpret=interpret
    )
    return out, seg_ids


def _ssum_bwd(num_segments, chunk, interpret, seg_ids, g):
    import numpy as np

    dmsgs = jnp.where(
        (seg_ids < num_segments)[:, None],
        g.take(jnp.minimum(seg_ids, num_segments - 1), axis=0),
        0.0,
    )
    d_ids = np.zeros(seg_ids.shape, dtype=jax.dtypes.float0)
    return dmsgs, d_ids


sorted_segment_sum.defvjp(_ssum_fwd, _ssum_bwd)


def _segsum_vmem_bytes(out_rows: int, d: int, chunk: int) -> int:
    """Lane-padded VMEM footprint of one kernel call: the f32 accumulator
    scratch pads its last dim to the 128-lane tile width, plus
    double-buffered chunk inputs and the (chunk, chunk+align) one-hot."""
    acc_bytes = out_rows * _round_up(d, 128) * 4
    chunk_bytes = 2 * chunk * (_round_up(d, 128) * 4 + 128 * 4)
    return acc_bytes + chunk_bytes + chunk * (chunk + _WINDOW_ALIGN) * 4


# VMEM budget for plan gating, resolved ONCE at import so a run's effective
# budget is a constant of the process: plans (and the pinned budget-window
# test assertions) cannot silently change under a stray env var set between
# calls, and the effective value is recorded in the module state. Override
# with DIFFMM_SEGSUM_VMEM_MB before import (documented in config.py's env
# knob table); non-default values are logged loudly here.
_VMEM_BUDGET_MB: int = 64


def _init_vmem_budget() -> int:
    import os

    budget = int(os.environ.get("DIFFMM_SEGSUM_VMEM_MB", "64"))
    if budget != 64:
        import warnings

        warnings.warn(
            f"DIFFMM_SEGSUM_VMEM_MB={budget} overrides the measured 64 MB "
            "segsum VMEM budget for this process",
            stacklevel=2,
        )
    return budget


_VMEM_BUDGET_MB = _init_vmem_budget()


def segsum_fits_vmem(num_segments: int, d: int, chunk: int = 512) -> bool:
    """VMEM budget for the scratch accumulator. Measured on v5e (128 MB
    VMEM/core): an 82 MB accumulator (160k rows at d=64) compiles and runs
    STANDALONE with ``vmem_limit_bytes`` raised to the footprint — but
    round 4 found the same piece size crashes the TPU worker when the
    kernel runs INSIDE the joint training program (sports-scale ranked
    reduce, 84 MB piece: standalone parity passed, full epoch took the
    worker down), because the surrounding program's live buffers share the
    same VMEM. Gate at 64 MB to leave that headroom; net: num_segments <=
    ~127k rows at d<=128 per piece (more pieces, same math). (The earlier
    2x-RMW/15 MB accounting was the Mosaic *default* scoped limit on
    scratch, not a pipeline doubling — lifted by the explicit limit.)"""
    out_rows = _round_up(num_segments + chunk + _WINDOW_ALIGN, 8)
    return _segsum_vmem_bytes(out_rows, d, chunk) <= _VMEM_BUDGET_MB * 1024 * 1024


def max_segments_in_vmem(d: int, chunk: int = 512) -> int:
    """Largest per-call segment count within the scoped-VMEM budget."""
    lo, hi = chunk, 10**7
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if segsum_fits_vmem(mid, d, chunk):
            lo = mid
        else:
            hi = mid - 1
    return lo


def default_max_edges_per_piece(d: int) -> int:
    """HBM bound on one piece's transient edge gather: the kernel's msgs
    input is an (E, d) f32 slice of the per-edge gather, and XLA bounds the
    materialized gather to the largest piece when pieces are sliced (a
    single all-edges piece forces the FULL (nnz, d) gather — observed
    26.8 GB HBM OOM at 104.8M edges, d=64). 1 GB per piece keeps the
    transient comfortably inside a 16 GB chip alongside the embeddings."""
    return (1 << 30) // (d * 4)


class StaticSegsumPlan(NamedTuple):
    """Host-made piecewise plan for a STATIC sorted id layout.

    Carries the ``chunk`` it was validated with: the spans_fit window check
    and the VMEM sizing in :func:`make_segsum_plan` are only valid for that
    exact chunk, so execution must use the same value — a plan without it
    once let the kernel run at the default 512 while the plan was built for
    another chunk, silently dropping edges past the executed window.

    Fields:
      pieces: static ``(edge_lo, edge_hi, seg_lo, seg_hi)`` ranges.
      chunk: kernel chunk (edges per one-hot MXU matmul) the plan was
        window-checked and VMEM-sized against.
    """

    pieces: tuple
    chunk: int

    def __len__(self) -> int:  # piece count (log/telemetry convenience)
        return len(self.pieces)


def make_segsum_plan(
    ids_sorted,
    num_segments: int,
    d: int,
    chunk: int = 512,
    max_edges_per_piece: int | None = None,
):
    """Host-side plan for arbitrarily many segments: split the (STATIC)
    sorted-id layout into segment ranges that each fit the VMEM window AND
    the per-piece edge budget (which bounds the transient (E, d) gather in
    HBM — see :func:`default_max_edges_per_piece`), with static edge
    boundaries found by searchsorted. Returns a :class:`StaticSegsumPlan`
    of ``(edge_lo, edge_hi, seg_lo, seg_hi)`` pieces, or None when any
    piece fails the chunk-span window check (the kernel would drop
    entries). Sentinel ids (== num_segments) fall after the last piece and
    are excluded entirely. A single segment with more edges than the budget
    becomes its own oversized piece (it cannot split below segment
    granularity)."""
    import numpy as np

    ids = np.asarray(ids_sorted)
    max_rows = max_segments_in_vmem(d, chunk) - chunk  # slack for the window
    if max_rows <= 0:
        return None
    if max_edges_per_piece is None:
        max_edges_per_piece = default_max_edges_per_piece(d)
    pieces = []
    seg_lo = 0
    while seg_lo < num_segments:
        seg_hi = min(seg_lo + max_rows, num_segments)
        edge_lo = int(np.searchsorted(ids, seg_lo, "left"))
        edge_hi = int(np.searchsorted(ids, seg_hi, "left"))
        if edge_hi - edge_lo > max_edges_per_piece:
            # largest segment prefix inside the edge budget; position
            # edge_lo+budget holds the first segment that must overflow
            cut = int(ids[edge_lo + max_edges_per_piece])
            seg_hi = max(seg_lo + 1, min(cut, seg_hi))
            edge_hi = int(np.searchsorted(ids, seg_hi, "left"))
        if edge_hi > edge_lo and not spans_fit(
            ids[edge_lo:edge_hi] - seg_lo, seg_hi - seg_lo, chunk
        ):
            return None
        pieces.append((edge_lo, edge_hi, seg_lo, seg_hi))
        seg_lo = seg_hi
    return StaticSegsumPlan(pieces=tuple(pieces), chunk=chunk)


def sorted_segment_sum_planned(
    msgs: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    plan,
    chunk: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Apply :func:`sorted_segment_sum` piecewise per a host-made plan
    (static edge/segment ranges), concatenating the piece outputs.

    ``plan``: a :class:`StaticSegsumPlan` (executes at the chunk it was
    validated with) or a raw pieces tuple + explicit ``chunk`` (tests /
    hand-tiled plans; defaults to 512 for raw tuples only).

    ``interpret=None`` resolves at trace time: compiled on TPU, interpreter
    on CPU (so CPU tests drive the same code path)."""
    if isinstance(plan, StaticSegsumPlan):
        assert chunk is None or chunk == plan.chunk, (chunk, plan.chunk)
        pieces, chunk = plan.pieces, plan.chunk
    else:
        pieces = plan
        if chunk is None:
            chunk = 512
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    outs = []
    for edge_lo, edge_hi, seg_lo, seg_hi in pieces:
        if edge_hi == edge_lo:
            outs.append(jnp.zeros((seg_hi - seg_lo, msgs.shape[1]), msgs.dtype))
            continue
        outs.append(
            sorted_segment_sum(
                msgs[edge_lo:edge_hi],
                seg_ids[edge_lo:edge_hi] - seg_lo,
                seg_hi - seg_lo,
                chunk,
                interpret,
            )
        )
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


class ShardedSegsumPlan(NamedTuple):
    """Host-made plan for the MXU sorted-segment-sum on a device mesh.

    SPMD constraint: a ``shard_map`` body is ONE program for every shard, so
    per-shard piece boundaries (as in :func:`make_segsum_plan`) cannot vary.
    Instead each shard reduces its edge slice into a uniform-size LOCAL
    buffer at a *dynamic* row offset (its first segment id), places it into
    the global output with ``dynamic_update_slice``, and a ``psum`` over the
    edge-sharding axes merges the partials — the contiguous-block layout of
    the globally sorted ids guarantees each shard touches one bounded
    segment range, whose max span (``local_rows``) is measured on host.

    Fields:
      mesh: the jax Mesh (hashable — plans key the propagator cache).
      axes: mesh axis names the edge dim is split over (e.g.
        ``("data", "model")`` — both, so every device reduces a slice).
      local_rows: static per-shard output rows (max shard segment span plus
        the kernel's chunk slack), VMEM-checked on host.
      chunk: kernel chunk (edges per one-hot MXU matmul).
    """

    mesh: Any
    axes: tuple
    local_rows: int
    chunk: int


def make_sharded_segsum_plan(
    ids_sorted,
    num_segments: int,
    d: int,
    mesh,
    axes: tuple,
    chunk: int = 512,
):
    """Plan the mesh form of the sorted-segment-sum for a STATIC padded id
    layout (same contract as :func:`make_segsum_plan`: only valid for the
    exact layout planned on; sentinel ids == num_segments are zero-message
    padding). Returns None when any shard fails the one-hot window check or
    the uniform local buffer exceeds the VMEM budget — callers then keep the
    XLA scatter path."""
    import numpy as np

    ids = np.asarray(ids_sorted)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    if len(ids) % n_shards:
        return None
    s = len(ids) // n_shards
    span_max = 1
    for k in range(n_shards):
        part = ids[k * s : (k + 1) * s]
        local = part - part[0]
        span = int(local[-1]) + 1
        # window check with every lane treated as real (global sentinels sit
        # at most one row above the last real id, so this is exact up to one
        # row of slack)
        if not spans_fit(local, span, chunk):
            return None
        span_max = max(span_max, span)
    local_rows = span_max + chunk  # slack so the kernel's slice never clamps
    if not segsum_fits_vmem(local_rows, d, chunk):
        return None
    return ShardedSegsumPlan(
        mesh=mesh, axes=tuple(axes), local_rows=local_rows, chunk=chunk
    )


def sharded_sorted_segment_sum(
    msgs: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    plan: ShardedSegsumPlan,
    interpret: bool | None = None,
) -> jax.Array:
    """Mesh form of :func:`sorted_segment_sum` per a
    :class:`ShardedSegsumPlan`: ``shard_map`` over the edge-sharded arrays,
    per-shard local kernel at a dynamic segment offset, ``psum`` of the
    placed partials (SURVEY.md §2.3 collectives contract). Exact: every edge
    lands in exactly one shard and segment sums are associative."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    d = msgs.shape[1]
    local_rows = plan.local_rows

    def local(msgs_l, ids_l):
        row_start = ids_l[0]
        out_l = sorted_segment_sum(
            msgs_l, ids_l - row_start, local_rows, plan.chunk, interpret
        )
        # place the local span into the (tail-padded) global frame; an
        # all-sentinel shard starts at num_segments and lands fully in the
        # dropped tail. Frame dtype follows the kernel OUTPUT (f32
        # accumulation), not the message dtype — bf16 messages would
        # otherwise hit dynamic_update_slice's same-dtype requirement
        buf = jnp.zeros((num_segments + local_rows, d), out_l.dtype)
        buf = jax.lax.dynamic_update_slice(buf, out_l, (row_start, 0))
        return jax.lax.psum(buf[:num_segments], plan.axes)

    edge_spec = P(plan.axes)
    return shard_map(
        local,
        mesh=plan.mesh,
        in_specs=(P(plan.axes, None), edge_spec),
        out_specs=P(),
        check_vma=False,
    )(msgs, seg_ids)


class RankedSegsumPlan(NamedTuple):
    """Host-made plan for the RANK-SPACE sorted-segment-sum: the reduction
    that works on DYNAMIC sorted id layouts (the diffusion-rebuilt modality
    graphs' item direction, reference `Main.py:195-253` — re-sorted on
    device every epoch, so no host span check is possible).

    Raw sorted ids can have gaps (items with zero incoming edges), so a
    chunk of E edges may span more than E segment rows and the one-hot
    window check of :func:`make_segsum_plan` needs the concrete ids. Ranks
    — ``cumsum(id != previous id)`` — are gap-free by construction, so a
    chunk of E sorted edges spans **at most E ranks by pigeonhole**: the
    window invariant holds for EVERY sorted layout, no data inspection
    needed. The reduction runs in rank space on the same MXU kernel; a
    scatter-free ``searchsorted`` gather inverts ranks back to segment rows.

    Fields:
      pieces: static ``(edge_lo, edge_hi)`` ranges; each piece's rank span
        is bounded by its edge count (pigeonhole again), VMEM-gated on host.
      nnz: the static padded edge count the plan was made for.
      chunk: kernel chunk (edges per one-hot MXU matmul).
    """

    pieces: tuple
    nnz: int
    chunk: int


def make_ranked_plan(
    nnz: int,
    d: int,
    chunk: int = 512,
    max_edges_per_piece: int | None = None,
):
    """Plan the rank-space reduction for ANY sorted id layout of ``nnz``
    (padded) edges — purely shape-based: rank spans are bounded by edge
    counts, so no id data is needed (unlike :func:`make_segsum_plan`).
    Returns None only when even a single chunk cannot fit VMEM."""
    cap = max_segments_in_vmem(d, chunk) - chunk
    if cap <= 0:
        return None
    if max_edges_per_piece is not None:
        cap = min(cap, max_edges_per_piece)
    pieces = tuple(
        (lo, min(lo + cap, nnz)) for lo in range(0, max(nnz, 1), cap)
    )
    return RankedSegsumPlan(pieces=pieces, nnz=nnz, chunk=chunk)


def make_rank_aux(seg_ids: jax.Array, num_segments: int) -> tuple:
    """Precompute the rank-space machinery for a sorted id layout:
    ``(ranks, seg_rank, seg_found)`` — the per-edge dense ranks, each
    segment row's rank (clipped), and whether the segment occurs at all.

    The layout is FIXED once an epoch's adjacency is built, while the
    reduction runs ~hundreds of times per epoch inside the joint scan
    (forward + backward of every propagation), so Coach hoists this onto
    the adjacency (``BiAdj.rank_aux``) — measured 0.43 ms (cumsum) +
    1.13 ms (searchsorted) per call on v5e/tiktok when computed inline,
    several times the kernel itself. Jittable; runs inside the epoch's
    adjacency-build program."""
    ids = seg_ids.astype(jnp.int32)
    nnz = ids.shape[0]
    changed = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (ids[1:] != ids[:-1]).astype(jnp.int32)]
    )
    ranks = jnp.cumsum(changed) - 1  # (nnz,) dense, ascending, ranks[0] == 0
    seg = jnp.arange(num_segments, dtype=jnp.int32)
    pos = jnp.searchsorted(ids, seg)  # first occurrence per segment
    pos_c = jnp.minimum(pos, nnz - 1)
    seg_found = ids[pos_c] == seg
    seg_rank = ranks[pos_c]
    return ranks, seg_rank, seg_found


def ranked_segment_sum(
    msgs: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    plan: RankedSegsumPlan,
    interpret: bool | None = None,
    aux: tuple | None = None,
) -> jax.Array:
    """segment_sum for ASCENDING (possibly dynamic) ``seg_ids`` via the MXU
    kernel in rank space. Exact for every sorted layout: ranks are dense,
    so every kernel window invariant holds by pigeonhole.

    Contract matches :func:`sorted_segment_sum`: out-of-range ids are
    padding and their message rows MUST be zero (they receive ranks like
    any other id, accumulate zeros, and are never read back — the
    inversion only looks up ids < num_segments).

    ``aux``: optional :func:`make_rank_aux` result for this exact id
    layout (hoisted per-epoch by the caller); None computes it inline.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nnz, d = msgs.shape
    assert nnz == plan.nnz, (nnz, plan.nnz)
    ranks, seg_rank, seg_found = (
        aux if aux is not None else make_rank_aux(seg_ids, num_segments)
    )
    chunk = plan.chunk

    if len(plan.pieces) == 1:
        lo, hi = plan.pieces[0]
        buf = sorted_segment_sum(
            msgs, ranks, nnz + chunk, chunk, interpret
        )
    else:
        # rank-space accumulator; pieces may share a boundary rank (one
        # segment's edges straddling two pieces), so placements ADD via a
        # slice read-modify-write at each piece's dynamic rank offset.
        buf = jnp.zeros((nnz + chunk, d), jnp.float32)
        for lo, hi in plan.pieces:
            local_rows = (hi - lo) + chunk
            r0 = ranks[lo]
            out_l = sorted_segment_sum(
                msgs[lo:hi], ranks[lo:hi] - r0, local_rows, chunk, interpret
            )
            cur = jax.lax.dynamic_slice(buf, (r0, 0), (local_rows, d))
            buf = jax.lax.dynamic_update_slice(buf, cur + out_l, (r0, 0))

    # invert rank -> segment row (precomputed first-occurrence binary
    # search); absent segments stay zero.
    out = buf.take(seg_rank, axis=0)
    return jnp.where(seg_found[:, None], out, 0.0)


class ShardedRankedPlan(NamedTuple):
    """Host-made plan for the RANK-SPACE reduction on a device mesh — the
    missing quadrant of the plan matrix: DYNAMIC sorted layouts (the
    diffusion-rebuilt modality item direction) on multi-chip runs, which
    previously regressed to the XLA scatter (round-4 gap).

    SPMD shape: the body is one program per shard, so all sizing is static
    by pigeonhole — a shard of ``s`` sorted edges spans at most
    ``min(s, num_segments + 1)`` ranks (+1 for the shared sentinel rank),
    no data inspection needed. Each shard reduces its edge slice into a
    LOCAL rank-space buffer at its first rank's dynamic offset (piecewise
    when the VMEM cap demands), inverts rank -> segment against its OWN
    buffer (rows it never touched are zero, so out-of-shard segments
    contribute nothing), and a ``psum`` over the edge axes merges the
    (num_segments, d) partials — a rank split across two shards sums
    correctly because both place their partial at the same segment row.

    Fields:
      mesh / axes: the Mesh and the axis names the edge dim is split over.
      pieces: static ``(lo, hi)`` ranges WITHIN each shard's local slice
        (identical for every shard — SPMD), each VMEM-gated by edge count.
      local_rows: static rank-buffer rows per shard (span bound + piece
        slack + kernel chunk slack — dynamic_update_slice must never clamp).
      nnz: global padded edge count the plan was made for.
      chunk: kernel chunk (edges per one-hot MXU matmul).
    """

    mesh: Any
    axes: tuple
    pieces: tuple
    local_rows: int
    nnz: int
    chunk: int


def make_sharded_ranked_plan(
    nnz: int,
    num_segments: int,
    d: int,
    mesh,
    axes: tuple,
    chunk: int = 512,
    max_edges_per_piece: int | None = None,
):
    """Plan the mesh rank-space reduction for ANY sorted id layout of
    ``nnz`` (padded) edges — purely shape-based, like :func:`make_ranked_plan`.
    Returns None when the edge dim doesn't divide the shards or even a
    single chunk cannot fit VMEM."""
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    if nnz % n_shards:
        return None
    s = nnz // n_shards
    cap = max_segments_in_vmem(d, chunk) - chunk
    if cap <= 0:
        return None
    if max_edges_per_piece is not None:
        cap = min(cap, max_edges_per_piece)
    pieces = tuple((lo, min(lo + cap, s)) for lo in range(0, max(s, 1), cap))
    # rank span per shard: <= s by pigeonhole, <= num_segments + 1 globally
    # (all sentinels share one rank). Multi-piece placement offsets are
    # bounded by the span; add the largest piece + chunk so the local
    # dynamic_update_slice windows always fit without clamping. A
    # single-piece plan runs the kernel DIRECTLY at local_rows, so it must
    # stay within the VMEM-gated cap + chunk: span + chunk suffices there
    # (ranks - r0 <= span - 1; span <= s <= cap) — span + s + chunk would
    # be ~2x the validated budget when span ~ s (large catalogs) and crash
    # the worker in exactly the regime the gate exists for.
    span = min(s, num_segments + 1)
    if len(pieces) == 1:
        local_rows = span + chunk
    else:
        max_piece = max(hi - lo for lo, hi in pieces)
        local_rows = span + max_piece + chunk
    return ShardedRankedPlan(
        mesh=mesh, axes=tuple(axes), pieces=pieces,
        local_rows=local_rows, nnz=nnz, chunk=chunk,
    )


def sharded_ranked_segment_sum(
    msgs: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    plan: ShardedRankedPlan,
    interpret: bool | None = None,
    aux: tuple | None = None,
) -> jax.Array:
    """Mesh form of :func:`ranked_segment_sum` per a
    :class:`ShardedRankedPlan`. Contract matches the single-device form:
    ids sorted ascending (ANY layout), out-of-range ids are padding with
    zero message rows; ``aux`` is the hoisted :func:`make_rank_aux` result
    (None computes it inline — the cumsum/searchsorted run sharded)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nnz, d = msgs.shape
    assert nnz == plan.nnz, (nnz, plan.nnz)
    ranks, seg_rank, seg_found = (
        aux if aux is not None else make_rank_aux(seg_ids, num_segments)
    )
    local_rows = plan.local_rows
    chunk = plan.chunk

    def local(msgs_l, ranks_l, seg_rank_r, seg_found_r):
        r0 = ranks_l[0]
        if len(plan.pieces) == 1:
            buf = sorted_segment_sum(
                msgs_l, ranks_l - r0, local_rows, chunk, interpret
            )
        else:
            buf = jnp.zeros((local_rows, d), jnp.float32)
            for lo, hi in plan.pieces:
                rows_p = (hi - lo) + chunk
                rp = ranks_l[lo]
                out_p = sorted_segment_sum(
                    msgs_l[lo:hi], ranks_l[lo:hi] - rp, rows_p, chunk,
                    interpret,
                )
                cur = jax.lax.dynamic_slice(buf, (rp - r0, 0), (rows_p, d))
                buf = jax.lax.dynamic_update_slice(
                    buf, cur + out_p, (rp - r0, 0)
                )
        # rank -> segment inversion against the LOCAL buffer only: rows this
        # shard never wrote are zero, so segments outside its rank window
        # contribute nothing and the psum below is exact.
        rel = seg_rank_r - r0
        in_win = (rel >= 0) & (rel < local_rows) & seg_found_r
        out = buf.take(jnp.clip(rel, 0, local_rows - 1), axis=0)
        out = jnp.where(in_win[:, None], out, 0.0)
        return jax.lax.psum(out, plan.axes)

    return shard_map(
        local,
        mesh=plan.mesh,
        in_specs=(P(plan.axes, None), P(plan.axes), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(msgs, ranks, seg_rank, seg_found)


def spans_fit(ids_sorted, num_segments: int, chunk: int = 512) -> bool:
    """Host-side correctness gate: every fixed [k*chunk, (k+1)*chunk) window
    of the sorted ids must span < chunk distinct positions (entries with
    ``id - chunk_first_id >= chunk`` would be dropped by the one-hot window).
    Run on the exact (padded) id layout the kernel will see; sentinel ids
    (== num_segments) are exempt — their messages are zeroed by the caller.
    """
    import numpy as np

    ids = np.asarray(ids_sorted)
    n = _round_up(len(ids), chunk)
    ids = np.concatenate(
        [ids, np.full(n - len(ids), num_segments, dtype=ids.dtype)]
    )
    blocks = ids.reshape(-1, chunk)
    first = blocks[:, :1]
    local = blocks - first
    real = blocks < num_segments
    return bool((np.where(real, local, 0) < chunk).all())
