"""Negative sampling: never returns a train-set item; uniform over the rest."""

import jax
import numpy as np

from diffmm_tpu.data.loader import to_device
from diffmm_tpu.data.sampling import negative_sampling


def test_negatives_avoid_train_items(tiny_data):
    data = to_device(tiny_data)
    negs = np.asarray(
        negative_sampling(
            jax.random.PRNGKey(0),
            data.train_rows,
            data.train_dense,
            tiny_data.item_num,
        )
    )
    rows = tiny_data.train_rows
    dense = tiny_data.train_dense
    # device edge arrays are padded to the shard alignment; only the real
    # nnz lanes are consumed downstream
    negs = negs[: tiny_data.nnz]
    assert negs.shape == rows.shape
    assert (negs >= 0).all() and (negs < tiny_data.item_num).all()
    collisions = dense[rows, negs]
    assert collisions.sum() == 0


def test_negatives_vary_with_key(tiny_data):
    data = to_device(tiny_data)
    a = np.asarray(
        negative_sampling(
            jax.random.PRNGKey(1), data.train_rows, data.train_dense,
            tiny_data.item_num,
        )
    )
    b = np.asarray(
        negative_sampling(
            jax.random.PRNGKey(2), data.train_rows, data.train_dense,
            tiny_data.item_num,
        )
    )
    assert (a != b).mean() > 0.5
