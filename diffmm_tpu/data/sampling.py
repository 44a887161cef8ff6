"""Vectorized on-device negative sampling.

Replaces the reference's per-interaction Python rejection loop against a DOK
hash (reference `DataHandler.py:159-169`) with a fixed-round vectorized
resample: draw uniform item ids for every interaction at once, test membership
with one lookup against the train store — a gather from the dense int8 matrix,
or per-lane binary search on the O(nnz) CSR store (data/membership.py; bit-
identical bits, so the two stores sample identical negatives from identical
keys) — and redraw only the colliding lanes. With catalog densities <= ~1%
(BASELINE.md sparsity table), 8 rounds leave a collision probability < 1e-16
per lane; any survivor keeps its last draw (statistically negligible, and the
reference's distribution — uniform over non-interacted items — is preserved to
that tolerance).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from diffmm_tpu.data.membership import contains


@partial(jax.jit, static_argnames=("item_num", "rounds"))
def negative_sampling(
    key: jax.Array,
    users: jax.Array,
    train_store,
    item_num: int,
    rounds: int = 8,
) -> jax.Array:
    """One negative item per interaction (reference `DataHandler.py:159-169`).

    Args:
      key: PRNG key.
      users: (nnz,) int32 user id of each interaction.
      train_store: (U, I) int8 dense matrix or TrainCSR membership store.
      item_num: catalog size.
      rounds: fixed resampling rounds.

    Returns:
      (nnz,) int32 negative item ids.
    """
    n = users.shape[0]

    def body(carry, subkey):
        negs, needs = carry
        draws = jax.random.randint(subkey, (n,), 0, item_num, dtype=jnp.int32)
        candidate = jnp.where(needs, draws, negs)
        hit = contains(train_store, users, candidate)
        return (candidate, needs & hit), None

    init_negs = jnp.zeros((n,), dtype=jnp.int32)
    (negs, _), _ = jax.lax.scan(
        body, (init_negs, jnp.ones((n,), dtype=bool)), jax.random.split(key, rounds)
    )
    return negs
