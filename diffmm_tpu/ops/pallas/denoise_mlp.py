"""Fused Pallas TPU kernel for the denoiser MLP forward.

Computes, per batch tile, entirely on-chip:

    h   = tanh(x @ W1x + temb_proj + b1)        # first (wide-in) layer
    out = h @ W2 + b2                           # second (wide-out) layer

i.e. the single-hidden-layer denoiser of reference `Model.py:210-218` with
the time-embedding concat folded away: ``concat([x, t]) @ W1`` is split as
``x @ W1[:I] + t @ W1[I:]``, and the tiny ``t @ W1[I:]`` term (B x 10 @ 10 x H)
is precomputed outside the kernel and streamed in as ``temb_proj``.

Why a kernel at all: the hidden activation ``h`` never round-trips HBM, both
matmuls run on the MXU from VMEM-resident tiles, and the K/N loops stream the
two wide weight matrices through VMEM with Pallas's pipelined BlockSpec DMA.
The XLA fallback (models/denoise.py) remains the default on CPU and for
multi-hidden-layer or gated (training-path) configurations.

Tiling: grid = (B/TB, K tiles of I+pad) for layer 1 accumulated in a VMEM
scratch, then (N tiles of I) for layer 2 — expressed as one 3D grid
(b, n, k) where the k loop accumulates h once per (b, *, *) and layer 2
fires on the last k step. All dims are zero-padded to lane multiples by the
caller wrapper.
"""

from __future__ import annotations

import functools

from diffmm_tpu.ops.pallas import round_up as _round_up

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer1_kernel(x_ref, w1_ref, tp_ref, h_out_ref, acc_ref):
    """Grid (nb, nk): accumulate x @ W1 over k; emit tanh(acc) on last k.

    With k innermost, each W1 block is streamed exactly once per batch tile
    (consecutive grid steps move the k block monotonically, so the Pallas
    pipeline never refetches)."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        # temb_proj carries b1 folded in (wrapper adds it)
        acc_ref[:, :] = tp_ref[:, :]

    acc_ref[:, :] += jnp.dot(
        x_ref[:, :], w1_ref[:, :], preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        h_out_ref[:, :] = jnp.tanh(acc_ref[:, :])


def _layer2_kernel(h_ref, w2_ref, b2_ref, out_ref):
    """Grid (nb, nn): one MXU matmul per (batch, out) tile."""
    out_ref[:, :] = (
        jnp.dot(h_ref[:, :], w2_ref[:, :], preferred_element_type=jnp.float32)
        + b2_ref[:, :]
    )


@functools.partial(jax.jit, static_argnames=("tb", "tk", "tn", "interpret"))
def fused_denoise_mlp(
    x: jax.Array,
    w1: jax.Array,
    temb_proj: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    tb: int = 128,
    tk: int = 512,
    tn: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``tanh(x @ w1 + temb_proj) @ w2 + b2`` fused on TPU.

    Args:
      x: (B, K) input rows (x_t, possibly modality-gated by the caller).
      w1: (K, H) first-layer weights.
      temb_proj: (B, H) precomputed time-emb projection **plus b1**.
      w2: (H, N) second-layer weights.
      b2: (N,) second-layer bias.
      tb/tk/tn: batch/contraction/output tile sizes (lane-aligned).
    """
    B, K = x.shape
    H = w1.shape[1]
    N = w2.shape[1]
    Bp, Kp, Np = _round_up(B, tb), _round_up(K, tk), _round_up(N, tn)
    Hp = _round_up(H, 128)  # lane-align the hidden dim too (tanh(0)=0 pads
    # contribute nothing through the zero rows of w2p)

    xp = jnp.pad(x, ((0, Bp - B), (0, Kp - K)))
    w1p = jnp.pad(w1, ((0, Kp - K), (0, Hp - H)))
    tpp = jnp.pad(temb_proj, ((0, Bp - B), (0, Hp - H)))
    w2p = jnp.pad(w2, ((0, Hp - H), (0, Np - N)))
    b2p = jnp.pad(b2, (0, Np - N)).reshape(1, Np)
    H = Hp

    h = pl.pallas_call(
        _layer1_kernel,
        grid=(Bp // tb, Kp // tk),
        in_specs=[
            pl.BlockSpec((tb, tk), lambda b, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, H), lambda b, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, H), lambda b, k: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, H), lambda b, k: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Kp * H,
            bytes_accessed=(Bp * Kp + (Bp // tb) * Kp * H + 2 * Bp * H) * 4,
            transcendentals=Bp * H,
        ),
        interpret=interpret,
    )(xp, w1p, tpp)

    out = pl.pallas_call(
        _layer2_kernel,
        grid=(Bp // tb, Np // tn),
        in_specs=[
            pl.BlockSpec((tb, H), lambda b, n: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, tn), lambda b, n: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda b, n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda b, n: (b, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * H * Np,
            bytes_accessed=(Bp * H + (Bp // tb) * H * Np + Bp * Np) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(h, w2p, b2p)
    return out[:B, :N]


def denoise_forward_pallas(params, x_t, timesteps, modal_feat=None, interpret=False):
    """Drop-in for models/denoise.py::denoise_forward when the config is the
    single-hidden-layer reference shape (denoise_dim=[H]). Falls back is the
    caller's responsibility (see models/denoise.py::make_denoise_apply)."""
    from diffmm_tpu.models.denoise import timestep_embedding

    assert len(params["in_layers"]) == 1 and len(params["out_layers"]) == 1
    emb = timestep_embedding(timesteps, params["emb"]["w"].shape[0])
    time_emb = emb @ params["emb"]["w"] + params["emb"]["b"]

    if modal_feat is not None:
        projected = x_t @ modal_feat
        gate = jax.nn.sigmoid(projected @ params["gate"]["w"] + params["gate"]["b"])
        x_t = x_t + (projected * gate) @ modal_feat.T

    w1 = params["in_layers"][0]["w"]  # (I + demb, H)
    b1 = params["in_layers"][0]["b"]
    item_num = x_t.shape[1]
    w1x, w1t = w1[:item_num], w1[item_num:]
    temb_proj = time_emb @ w1t + b1  # (B, H), b1 folded
    return fused_denoise_mlp(
        x_t,
        w1x,
        temb_proj,
        params["out_layers"][0]["w"],
        params["out_layers"][0]["b"],
        interpret=interpret,
    )
