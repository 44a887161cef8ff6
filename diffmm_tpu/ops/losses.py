"""Differentiable loss ops shared by the trainer and models.

Parity targets (semantics, not torch RNG streams):
  * ``bpr_loss``   — reference `Utils/Utils.py:78-98`
  * ``info_nce``   — reference `Utils/Utils.py:57-75`
  * ``l2_reg_loss``— reference `Utils/Utils.py:45-54`
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Row-wise L2 normalization, matching `torch.nn.functional.normalize`
    (p=2, eps=1e-12 clamp on the norm)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def bpr_loss(user_emb: jax.Array, pos_emb: jax.Array, neg_emb: jax.Array) -> jax.Array:
    """Bayesian Personalized Ranking loss (reference `Utils/Utils.py:78-98`).

    ``-mean(log(1e-5 + sigmoid(<u,p> - <u,n>)))`` — the reference's ``10e-6``
    literal equals 1e-5.
    """
    pos_score = jnp.sum(user_emb * pos_emb, axis=1)
    neg_score = jnp.sum(user_emb * neg_emb, axis=1)
    return -jnp.mean(jnp.log(1e-5 + jax.nn.sigmoid(pos_score - neg_score)))


def info_nce(
    view1: jax.Array,
    view2: jax.Array,
    idx: jax.Array,
    temperature: float,
    b_cos: bool = True,
) -> jax.Array:
    """In-batch InfoNCE (reference `Utils/Utils.py:57-75`).

    Gathers ``idx`` rows from both full views, L2-normalizes, forms the
    (B, B) similarity matrix, and returns ``-mean(diag(log_softmax))``.
    Duplicate indices in ``idx`` are kept (they act as extra in-batch
    negatives, exactly as in the reference).
    """
    v1 = view1.take(idx, axis=0)
    v2 = view2.take(idx, axis=0)
    if b_cos:
        v1 = l2_normalize(v1, axis=1)
        v2 = l2_normalize(v2, axis=1)
    logits = (v1 @ v2.T) / temperature
    log_probs = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(jnp.diagonal(log_probs))


def l2_reg_loss(reg: float, embeddings: Sequence[jax.Array]) -> jax.Array:
    """``reg * sum_i ||E_i||_F^2`` (reference `Utils/Utils.py:45-54`)."""
    total = jnp.asarray(0.0, dtype=jnp.float32)
    for emb in embeddings:
        total = total + jnp.sum(jnp.square(emb))
    return total * reg
