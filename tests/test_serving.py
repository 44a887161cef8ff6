"""Serving index: masked top-k recommendations from a trained model."""

import copy

import pytest

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


def test_export_serves_best_epoch_not_final(tmp_path):
    """The reference selects models by best test Recall (`Main.py:71-78`);
    the exported index must reproduce the BEST epoch's Recall, not the final
    epoch's (with this config the model measurably degrades after its best
    epoch, so best != last and the two indices disagree)."""
    import jax.numpy as jnp

    from diffmm_tpu.config import Config
    from diffmm_tpu.data.synthetic import make_synthetic_host_data
    from diffmm_tpu.eval.ranking import dcg_table, make_eval_batch

    cfg = Config()
    cfg.base.seed = 7
    cfg.base.latdim = 16
    cfg.base.denoise_dim = "[32]"
    cfg.train.batch = 16
    cfg.train.test_batch = 64
    cfg.train.lr = 0.03
    host = make_synthetic_host_data(
        cfg, user_num=60, item_num=48, seed=5, structure_rank=4,
        test_per_user=3,
    )
    coach = Coach(cfg, host, checkpoint_dir=str(tmp_path / "ckpt"))
    best = coach.run(epochs=8)
    n_epochs = 8
    assert best["best_epoch"] < n_epochs - 1, (
        "precondition: best must be a mid-run epoch for this test to bite"
    )
    assert coach.best_snapshot is not None
    assert coach.best_snapshot["epoch"] == best["best_epoch"]

    def recall_of(index):
        sums = make_eval_batch(cfg.base.topk)(
            index.u_final,
            index.i_final,
            jnp.asarray(host.test_users),
            jnp.ones(len(host.test_users), dtype=bool),
            index.train_dense,
            jnp.asarray(host.test_items),
            jnp.asarray(host.test_counts),
            dcg_table(cfg.base.topk),
        )
        return float(sums.recall) / len(host.test_users)

    best_index = build_index(coach)  # default: best epoch
    final_index = build_index(coach, use_best=False)
    r_best = recall_of(best_index)
    r_final = recall_of(final_index)
    assert r_best == pytest.approx(best["Recall"], rel=1e-5)
    assert r_best > r_final, (r_best, r_final)

    # the snapshot survives checkpoint/resume: a fresh Coach restores it and
    # exports the same best-epoch index
    coach2 = Coach(cfg, host, checkpoint_dir=str(tmp_path / "ckpt"))
    resumed = coach2.restore_checkpoint()
    assert resumed is not None
    assert coach2.best_snapshot is not None
    assert coach2.best_snapshot["epoch"] == best["best_epoch"]
    r_resumed = recall_of(build_index(coach2))
    assert r_resumed == pytest.approx(best["Recall"], rel=1e-5)
