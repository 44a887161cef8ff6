"""Multi-modal LightGCN-style model: parameters + functional forward.

Parity target: reference `Model.py:15-134` (class ``Model`` / ``gcn_MM``).

Dataflow of ``gcn_mm`` (reference `Model.py:84-132`):
  1. project raw modality features to latdim via per-modality Linear layers;
  2. per modality: propagate ``[u_embs ; l2norm(proj_feats)]`` one hop over
     that modality's rebuilt adjacency -> modality view embeddings;
  3. propagate ``[u_embs ; i_embs]`` one hop over the main adjacency
     (the reference recomputes this identical product once per modality —
     `Model.py:110-123` — we compute it once; same math, fewer SpMMs);
  4. ``aware_m = id_prop + modal_adj_weight * modal_view_m``;
  5. fuse with learned softmax modality weights;
  6. final hop + residual:
     ``final = (1 + residual_weight) * (fused + A@fused)`` (`Model.py:129-131`;
     the reference's ``final_embs = modal_embs; final_embs += ...`` chain
     ALIASES ``modal_embs``, so the second in-place ``+= rw * modal_embs``
     reads the already-updated ``fused + A@fused``, not the original fused).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from diffmm_tpu.ops.graph import BiAdj, spmm_bi
from diffmm_tpu.ops.losses import l2_normalize

Params = dict[str, Any]


class GCNOutput(NamedTuple):
    """Mirror of the reference's GCNOutput dataclass (`Model.py:72-81`).

    ``modal_u/modal_i`` stack the per-modality one-hop views in modality order
    (image, text[, audio]) as (M, U, d) / (M, I, d). ``id_u/id_i`` expose the
    one-hop ID propagation over the main graph — identical to the first
    (pre-noise) cross-layer-CL propagation (reference `Main.py:315-319` runs
    the same operator on the same embeddings), so the trainer reuses it
    instead of recomputing."""

    u_final: jax.Array
    i_final: jax.Array
    modal_u: jax.Array
    modal_i: jax.Array
    id_u: jax.Array
    id_i: jax.Array


def _xavier_uniform(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def _torch_linear(key, d_in, d_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound, dtype=jnp.float32),
        "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound, dtype=jnp.float32),
    }


def init_gcn_params(
    key: jax.Array,
    user_num: int,
    item_num: int,
    latdim: int,
    feat_dims: list[int],
) -> Params:
    """Parameters of the main model (reference `Model.py:16-39`).

    ``feat_dims`` lists raw feature dims in modality order; its length (2 or 3)
    decides the modal_weight size (`Model.py:34-37`).
    """
    n_modal = len(feat_dims)
    keys = jax.random.split(key, 2 + n_modal)
    return {
        "u_embs": _xavier_uniform(keys[0], (user_num, latdim)),
        "i_embs": _xavier_uniform(keys[1], (item_num, latdim)),
        "modal_proj": [
            _torch_linear(keys[2 + m], feat_dims[m], latdim) for m in range(n_modal)
        ],
        "modal_weight": jnp.full((n_modal,), 1.0 / n_modal, dtype=jnp.float32)
        if n_modal == 3
        else jnp.full((n_modal,), 0.5, dtype=jnp.float32),
    }


def project_features(params: Params, raw_feats: list[jax.Array]) -> list[jax.Array]:
    """Per-modality Linear projections (reference `Model.py:47-58`)."""
    return [
        f @ p["w"] + p["b"] for f, p in zip(raw_feats, params["modal_proj"])
    ]


def gcn_mm(
    params: Params,
    adj: BiAdj,
    modal_adjs: list[BiAdj],
    raw_feats: list[jax.Array],
    modal_adj_weight: float,
    residual_weight: float,
    main_segsum: tuple = (None, None),
    modal_segsum: tuple = (None, None),
    segsum_compute: str = "f32",
    modal_wide_plan=None,
) -> GCNOutput:
    """Multi-modal graph aggregation (reference `Model.py:60-134`).

    ``main_segsum``/``modal_segsum``: host-made static plans selecting the
    MXU sorted-segment-sum per propagation direction on the sparse graph
    form (see ops/graph.py::spmm_bi); no-ops on the dense form.
    ``segsum_compute``: message dtype on those kernel paths ("bf16" = the
    dense form's rounding policy; f32 accumulation either way).
    ``modal_wide_plan``: static user-direction plan at width M*d — runs the
    modal loop's M shared-layout reductions as single wide kernel calls
    (ops/graph.py::spmm_bi_modal_stacked; coach._stacked_gate measurement).
    """
    u_embs = params["u_embs"]
    i_embs = params["i_embs"]
    feats = project_features(params, raw_feats)
    weight = jax.nn.softmax(params["modal_weight"])

    # Per-modality one-hop view over the rebuilt modality adjacency.
    feats_n = [l2_normalize(f, axis=1) for f in feats]
    if modal_wide_plan is not None and len(modal_adjs) > 1:
        from diffmm_tpu.ops.graph import spmm_bi_modal_stacked

        modal_u, modal_i = spmm_bi_modal_stacked(
            modal_adjs, u_embs, feats_n, modal_wide_plan, modal_segsum[1],
            segsum_compute,
        )
    else:
        modal_u, modal_i = [], []
        for m_adj, f in zip(modal_adjs, feats_n):
            mu, mi = spmm_bi(m_adj, u_embs, f, modal_segsum, segsum_compute)
            modal_u.append(mu)
            modal_i.append(mi)
        modal_u = jnp.stack(modal_u)  # (M, U, d)
        modal_i = jnp.stack(modal_i)  # (M, I, d)

    # ID propagation over the main graph (identical per modality in the
    # reference; computed once here).
    id_u, id_i = spmm_bi(adj, u_embs, i_embs, main_segsum, segsum_compute)

    aware_u = id_u[None] + modal_adj_weight * modal_u  # (M, U, d)
    aware_i = id_i[None] + modal_adj_weight * modal_i
    fused_u = jnp.einsum("m,mud->ud", weight, aware_u)
    fused_i = jnp.einsum("m,mid->id", weight, aware_i)

    hop_u, hop_i = spmm_bi(adj, fused_u, fused_i, main_segsum, segsum_compute)
    # Reference `Model.py:129-131` with torch in-place aliasing semantics:
    # final = (1 + rw) * (fused + A@fused).
    final_u = (1.0 + residual_weight) * (fused_u + hop_u)
    final_i = (1.0 + residual_weight) * (fused_i + hop_i)

    return GCNOutput(
        u_final=final_u, i_final=final_i, modal_u=modal_u, modal_i=modal_i,
        id_u=id_u, id_i=id_i,
    )
