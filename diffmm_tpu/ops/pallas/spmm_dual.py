"""Dual-direction dense bipartite propagation in ONE pass over the adjacency.

The dense graph form (ops/graph.py ``DenseBiAdj``) computes the two message
directions as two separate MXU matmuls:

    y_u = M  @ z_i        # (U, I) @ (I, d)
    y_i = Mᵀ @ z_u        # (I, U) @ (U, d)

XLA streams the (U, I) matrix from HBM **twice** (once per direction), and
its VJP streams it twice more — and M is by far the largest operand (125 MB
on tiktok vs ~2 MB of embeddings). This kernel computes both directions in a
single pass: grid over U row-blocks; per step one block of M feeds both
``y_u[block] = M_blk @ z_i`` and an accumulation ``y_i += M_blkᵀ @ z_u[blk]``
into a VMEM-resident (I, d) buffer (its output block index is constant, so
Pallas keeps it on-chip across the whole grid).

The backward pass is the SAME contraction shape with the cotangents swapped
(``dz_u = M @ ḡ_i``, ``dz_i = Mᵀ @ ḡ_u``), so one kernel serves forward and
VJP — adjacency traffic per propagation drops 2x in both passes.

Fits when the (I, d) accumulator + one row-block of M sit in VMEM (~16 MB):
true for catalogs up to I ~ 20k at d=64; ops/graph.py auto-gates on that.
"""

from __future__ import annotations

import functools

from diffmm_tpu.ops.pallas import round_up as _round_up

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dual_kernel(mat_ref, zi_ref, zu_ref, yu_ref, yi_ref):
    u = pl.program_id(0)

    @pl.when(u == 0)
    def _():
        yi_ref[:, :] = jnp.zeros_like(yi_ref)

    mat = mat_ref[:, :]
    if mat.dtype != jnp.bfloat16:  # int8-stored block: convert in VMEM
        mat = mat.astype(jnp.bfloat16)
    yu_ref[:, :] = jnp.dot(mat, zi_ref[:, :], preferred_element_type=jnp.float32)
    yi_ref[:, :] += jax.lax.dot_general(
        mat,
        zu_ref[:, :],
        (((0,), (0,)), ((), ())),  # contract the U block dim: (I, d)
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("tu", "interpret"))
def _dual_call(
    mat: jax.Array,
    z_u: jax.Array,
    z_i: jax.Array,
    tu: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    U, I = mat.shape
    d = z_u.shape[1]
    Up = _round_up(U, tu)
    Ip = _round_up(I, 128)
    dp = _round_up(d, 128)
    # int8-stored adjacencies stay int8 into the kernel (converted per-block
    # in VMEM, _dual_kernel) so the HBM read is half-width; bf16 passes
    # through unchanged. f32 inputs round here.
    if mat.dtype not in (jnp.bfloat16, jnp.int8):
        mat = mat.astype(jnp.bfloat16)
    matp = jnp.pad(mat, ((0, Up - U), (0, Ip - I)))
    zup = jnp.pad(z_u.astype(jnp.bfloat16), ((0, Up - U), (0, dp - d)))
    zip_ = jnp.pad(z_i.astype(jnp.bfloat16), ((0, Ip - I), (0, dp - d)))

    yu, yi = pl.pallas_call(
        _dual_kernel,
        grid=(Up // tu,),
        in_specs=[
            pl.BlockSpec((tu, Ip), lambda u: (u, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ip, dp), lambda u: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, dp), lambda u: (u, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tu, dp), lambda u: (u, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ip, dp), lambda u: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Up, dp), jnp.float32),
            jax.ShapeDtypeStruct((Ip, dp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # yi accumulates across steps
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Up * Ip * dp,
            bytes_accessed=Up * Ip * matp.dtype.itemsize
            + (Up + Ip) * dp * 2 + (Up + Ip) * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(matp, zip_, zup)
    return yu[:U, :d], yi[:I, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spmm_dual(mat, z_u, z_i, tu=256, interpret=False):
    """``(M @ z_i, Mᵀ @ z_u)`` in one adjacency pass (M treated as data)."""
    return _dual_call(mat, z_u, z_i, tu=tu, interpret=interpret)


def _spmm_dual_fwd(mat, z_u, z_i, tu, interpret):
    return _dual_call(mat, z_u, z_i, tu=tu, interpret=interpret), mat


def _spmm_dual_bwd(tu, interpret, mat, cotangents):
    g_u, g_i = cotangents  # cotangents of (y_u, y_i)
    # dz_u = M @ ḡ_i ; dz_i = Mᵀ @ ḡ_u — the same dual contraction, swapped
    dz_u, dz_i = _dual_call(mat, g_u, g_i, tu=tu, interpret=interpret)
    # the adjacency is data (never differentiated); integer storage takes
    # the float0 symbolic zero JAX requires, floats a DCE'd zeros
    if jnp.issubdtype(mat.dtype, jnp.integer):
        import numpy as onp

        dmat = onp.zeros(mat.shape, dtype=jax.dtypes.float0)
    else:
        dmat = jnp.zeros_like(mat)
    return dmat, dz_u, dz_i


spmm_dual.defvjp(_spmm_dual_fwd, _spmm_dual_bwd)


def pick_tu(
    user_num: int, item_num: int, d: int, mat_itemsize: int = 2
) -> int | None:
    """Largest U row-tile whose working set fits a conservative VMEM budget
    (None -> the fused kernel does not apply; use the two-pass path).
    int8-stored adjacencies (``mat_itemsize=1``) halve the HBM bytes of the
    row-block reads, but the kernel's in-VMEM bf16 conversion costs
    ``tu*ip*2`` alongside the double-buffered storage tiles, so the VMEM
    working set is counted in full — int8 buys traffic, not tile size."""
    ip = _round_up(item_num, 128)
    dp = _round_up(d, 128)
    yi_acc = ip * dp * 4
    zi = ip * dp * 2
    for tu in (512, 256, 128):
        mat_blk = tu * ip * mat_itemsize  # row-block, double-buffered
        # non-bf16 tiles convert in VMEM before the MXU dots (a bf16 copy)
        converted = tu * ip * 2 if mat_itemsize != 2 else 0
        zu_yu = 2 * tu * dp * 6
        if 2 * mat_blk + converted + yi_acc + zi + zu_yu <= 12 * 1024 * 1024:
            return tu
    return None


def dual_fits_vmem(user_num: int, item_num: int, d: int,
                   mat_itemsize: int = 2) -> bool:
    return pick_tu(user_num, item_num, d, mat_itemsize) is not None
