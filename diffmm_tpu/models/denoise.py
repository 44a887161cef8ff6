"""Denoiser MLP: parameters + functional forward.

Parity target: reference `Model.py:136-220` (class ``Denoise``).

Architecture (for hidden widths ``H = denoise_dims()``, catalog size ``I``):
  * sinusoidal time embedding of size ``d_emb_size`` -> Linear(d_emb, d_emb)
  * optional modality gating:
      ``p = x_t @ F;  x_t += (sigmoid(gate(p)) * p) @ F.T``   (`Model.py:204-208`)
  * ``concat([x_t, time_emb])`` -> in_layers ``[I+d_emb -> H...]`` with tanh
  * out_layers ``[H... -> I]`` with tanh between all but the last
    (`Model.py:210-218`)

The reference defines dropout but never applies it in forward (`Model.py:164`,
SURVEY.md C8) — faithfully omitted here.

Init: xavier-normal weights, N(0, 0.001) biases for in/out/emb layers
(`Model.py:170-181`); the gate layer keeps torch's default Linear init
(uniform +-1/sqrt(fan_in)) since ``init_weights`` skips it.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def _xavier_normal(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def _torch_linear_default(key, fan_in, shape):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(
        key, shape, minval=-bound, maxval=bound, dtype=jnp.float32
    )


def init_denoise_params(
    key: jax.Array, item_num: int, hidden_dims: list[int], time_emb_dim: int, latdim: int
) -> Params:
    """Build the parameter pytree for one modality's denoiser.

    Layer chain mirrors the reference's construction (`Main.py:97-98`:
    ``out_dims = denoise_dim + [item_num]; in_dims = out_dims[::-1]``, then
    `Model.py:156-162` prepends the time embedding to the first in-dim): the
    in-stack walks the hidden widths *reversed*, the out-stack forward —
    e.g. hidden [64, 32] gives I+10 -> 32 -> 64, then 64 -> 32 -> I.
    """
    in_dims = [item_num + time_emb_dim] + list(reversed(hidden_dims))
    out_dims = list(hidden_dims) + [item_num]
    keys = jax.random.split(key, 2 * (len(in_dims) - 1) + 2 * (len(out_dims) - 1) + 4)
    ki = iter(range(len(keys)))

    def layer(d_in, d_out):
        w = _xavier_normal(keys[next(ki)], (d_in, d_out))
        b = jax.random.normal(keys[next(ki)], (d_out,), dtype=jnp.float32) * 0.001
        return {"w": w, "b": b}

    params: Params = {
        "in_layers": [layer(a, b) for a, b in zip(in_dims[:-1], in_dims[1:])],
        "out_layers": [layer(a, b) for a, b in zip(out_dims[:-1], out_dims[1:])],
        "emb": layer(time_emb_dim, time_emb_dim),
        "gate": {
            "w": _torch_linear_default(keys[next(ki)], latdim, (latdim, latdim)),
            "b": _torch_linear_default(keys[next(ki)], latdim, (latdim,)),
        },
    }
    return params


def timestep_embedding(timesteps: jax.Array, dim: int) -> jax.Array:
    """Transformer sinusoidal time embedding (reference `Model.py:196-201`)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    angles = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def denoise_forward(
    params: Params,
    x_t: jax.Array,
    timesteps: jax.Array,
    modal_feat: jax.Array | None = None,
    compute_dtype=None,
) -> jax.Array:
    """Predict x0 from x_t (reference `Model.py:183-220`).

    Args:
      x_t: (B, I) noised interaction rows.
      timesteps: (B,) int timesteps.
      modal_feat: optional (I, latdim) projected modality features — supplied
        during diffusion training (`Model.py:404`) but NOT during reverse
        sampling (`Model.py:365`).
      compute_dtype: optional activation dtype for the MLP matmuls (e.g.
        ``jnp.bfloat16`` for the no-grad rebuild path, train.rebuild_compute).
        Weights are NOT cast here — pass params already in this dtype so the
        cast is hoisted out of reverse-sampling scan bodies. The tiny time
        embedding stays f32 and is cast after its projection.
    Returns:
      (B, I) predicted clean rows (in ``compute_dtype`` when set).
    """
    emb = timestep_embedding(timesteps, params["emb"]["w"].shape[0])
    time_emb = emb @ params["emb"]["w"] + params["emb"]["b"]
    if compute_dtype is not None:
        x_t = x_t.astype(compute_dtype)
        time_emb = time_emb.astype(compute_dtype)
        if modal_feat is not None:
            modal_feat = modal_feat.astype(compute_dtype)

    if modal_feat is not None:
        projected = x_t @ modal_feat  # (B, latdim)
        gate = jax.nn.sigmoid(projected @ params["gate"]["w"] + params["gate"]["b"])
        x_t = x_t + (projected * gate) @ modal_feat.T

    h = jnp.concatenate([x_t, time_emb], axis=-1)
    for layer in params["in_layers"]:
        h = jnp.tanh(h @ layer["w"] + layer["b"])
    n_out = len(params["out_layers"])
    for i, layer in enumerate(params["out_layers"]):
        h = h @ layer["w"] + layer["b"]
        if i != n_out - 1:
            h = jnp.tanh(h)
    return h
