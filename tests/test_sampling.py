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
            data.train_store,
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
            jax.random.PRNGKey(1), data.train_rows, data.train_store,
            tiny_data.item_num,
        )
    )
    b = np.asarray(
        negative_sampling(
            jax.random.PRNGKey(2), data.train_rows, data.train_store,
            tiny_data.item_num,
        )
    )
    assert (a != b).mean() > 0.5


def test_synthetic_structured_dense_users_stay_rectangular():
    """A near-saturated structured synthetic set leaves some users with
    fewer than test_per_user held-out candidates; the per-user test lists
    must stay rectangular, padded with the -1 sentinel eval masks (a
    repeated real id would double-count hits — advisor r2), and
    test_counts must record the TRUE candidate size (0 allowed: the
    metrics guard with max(counts, 1) and ideal-DCG[0] = 0)."""
    import numpy as np

    from diffmm_tpu.config import Config
    from diffmm_tpu.data.synthetic import make_synthetic_host_data

    cfg = Config()
    host = make_synthetic_host_data(
        cfg, user_num=6, item_num=5, density=0.9, test_per_user=4,
        seed=0, structure_rank=2,
    )
    assert host.test_items.shape == (6, 4)
    assert (host.test_counts >= 0).all()
    assert (host.test_counts <= 4).all()
    # near-saturated: at least one user must actually be short
    assert (host.test_counts < 4).any()
    for u in range(6):
        c = host.test_counts[u]
        row = host.test_items[u]
        assert (row[:c] >= 0).all() and (row[:c] < 5).all()
        assert (row[c:] == -1).all(), row
        # real entries are distinct (no double-countable repeats)
        assert len(np.unique(row[:c])) == c
