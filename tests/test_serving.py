"""Serving index: masked top-k recommendations from a trained model."""

import copy

import jax.numpy as jnp
import numpy as np

from diffmm_tpu.eval.serving import build_index, load_index, recommend, save_index
from diffmm_tpu.train.coach import Coach


def test_recommend_masks_train_items(tiny_config, tiny_data, tmp_path):
    coach = Coach(copy.deepcopy(tiny_config), tiny_data)
    coach.train_epoch(0)
    index = build_index(coach)

    users = jnp.arange(10, dtype=jnp.int32)
    k = 5
    ids, scores = recommend(index, users, k)
    assert ids.shape == (10, k) and scores.shape == (10, k)
    ids_np = np.asarray(ids)
    for row, u in enumerate(np.asarray(users)):
        seen = set(np.nonzero(tiny_data.train_dense[u])[0])
        assert not (set(ids_np[row]) & seen), f"user {u} got a seen item"
    # scores sorted descending
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()

    # unmasked mode may return seen items and scores dominate masked ones
    ids_u, _ = recommend(index, users, k, mask_seen=False)
    assert ids_u.shape == (10, k)

    # round-trip through disk
    save_index(index, str(tmp_path / "index"))
    back = load_index(str(tmp_path / "index"))
    ids2, _ = recommend(back, users, k)
    np.testing.assert_array_equal(ids_np, np.asarray(ids2))


def test_recommend_approx_mode(tiny_config, tiny_data):
    """approx_max_k path: same contract (ids in range, seen items masked);
    on CPU the lowering is exact, on TPU it is the hardware-bucketed op with
    a 0.95 recall target."""
    import copy

    from diffmm_tpu.train.coach import Coach

    coach = Coach(copy.deepcopy(tiny_config), tiny_data)
    coach.train_epoch(0)
    index = build_index(coach)
    users = jnp.asarray([0, 3, 7], dtype=jnp.int32)
    ids, scores = recommend(index, users, 5, approx=True)
    assert ids.shape == (3, 5)
    train = np.asarray(index.train_dense)
    for row, u in zip(np.asarray(ids), np.asarray(users)):
        assert all(0 <= i < tiny_data.item_num for i in row)
        assert not train[u, row].any(), "seen item served"
