"""Serving index: masked top-k recommendations from a trained model."""

import copy

import pytest

import jax.numpy as jnp
import numpy as np

from diffmm_tpu.eval.serving import build_index, load_index, recommend, save_index
from diffmm_tpu.train.coach import Coach

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box


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
    ptr = np.asarray(index.seen_indptr)
    idx = np.asarray(index.seen_indices)
    for row, u in zip(np.asarray(ids), np.asarray(users)):
        assert all(0 <= i < tiny_data.item_num for i in row)
        assert not (set(row) & set(idx[ptr[u]:ptr[u + 1]])), "seen item served"


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
            coach.data.train_store,
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


def test_recommend_mesh_sharded_matches_replicated(tiny_config, tiny_data):
    """VERDICT r3 #3: serving from a catalog-sharded index (model axis > 1)
    must return the replicated path's recommendations exactly — the shard-
    and-merge top-k is exact, not approximate."""
    from diffmm_tpu.eval.serving import place_index
    from diffmm_tpu.parallel.mesh import make_mesh

    coach = Coach(copy.deepcopy(tiny_config), tiny_data)
    coach.train_epoch(0)
    index = build_index(coach)
    users = jnp.arange(12, dtype=jnp.int32)
    k = 5
    ids_rep, scores_rep = recommend(index, users, k)

    mesh = make_mesh(8, model_parallel=4)
    assert tiny_data.item_num % 4 == 0, "fixture must divide the model axis"
    sharded = place_index(index, mesh)
    ids_sh, scores_sh = recommend(sharded, users, k, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(ids_rep), np.asarray(ids_sh))
    np.testing.assert_allclose(
        np.asarray(scores_rep), np.asarray(scores_sh), rtol=1e-5, atol=1e-5
    )
    # masking holds on the sharded path too
    ptr = np.asarray(index.seen_indptr)
    idx = np.asarray(index.seen_indices)
    for row, u in zip(np.asarray(ids_sh), np.asarray(users)):
        assert not (set(row) & set(idx[ptr[u]:ptr[u + 1]])), f"user {u} got a seen item"


def test_export_is_nnz_sized_not_catalog_squared(tiny_config, tiny_data, tmp_path):
    """The npz export carries the train mask as CSR: its byte size scales
    with nnz + embeddings, NOT user_num * item_num."""
    coach = Coach(copy.deepcopy(tiny_config), tiny_data)
    coach.train_epoch(0)
    index = build_index(coach)
    path = str(tmp_path / "index")
    save_index(index, path)
    import os

    d = index.u_final.shape[1]
    emb_bytes = 4 * d * (tiny_data.user_num + tiny_data.item_num)
    mask_bytes = os.path.getsize(path + ".npz") - emb_bytes
    # CSR: ~4 B per interaction + indptr; the dense form would be U*I
    assert mask_bytes < tiny_data.user_num * tiny_data.item_num, mask_bytes
    assert mask_bytes < 8 * tiny_data.nnz + 16 * tiny_data.user_num + 4096


def test_load_legacy_dense_export(tiny_config, tiny_data, tmp_path):
    """Pre-round-4 exports stored a dense (U, I) int8 mask; load_index must
    convert them to the seen-list form with identical recommendations."""
    coach = Coach(copy.deepcopy(tiny_config), tiny_data)
    coach.train_epoch(0)
    index = build_index(coach)
    path = str(tmp_path / "legacy.npz")
    np.savez(
        path,
        u_final=np.asarray(index.u_final),
        i_final=np.asarray(index.i_final),
        train_dense=tiny_data.train_dense.astype(np.int8),
    )
    back = load_index(path)
    users = jnp.arange(10, dtype=jnp.int32)
    ids_a, _ = recommend(index, users, 5)
    ids_b, _ = recommend(back, users, 5)
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
