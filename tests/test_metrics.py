"""Ranking metrics vs a brute-force Python port of the reference's calcRes
(reference `Main.py:422-448`)."""

import jax.numpy as jnp
import numpy as np

from diffmm_tpu.eval.ranking import dcg_table, make_eval_batch


def _reference_calc_res(top_idxs, test_u_its, topk):
    all_recall = all_ndcg = all_precision = 0.0
    for i in range(len(test_u_its)):
        u_rec_list = list(top_idxs[i])
        u_its = test_u_its[i]
        tst_num = len(u_its)
        max_dcg = np.sum(
            [np.reciprocal(np.log2(loc + 2)) for loc in range(min(tst_num, topk))]
        )
        hits = dcg = 0.0
        for item in u_its:
            if item in u_rec_list:
                hits += 1
                dcg += np.reciprocal(np.log2(u_rec_list.index(item) + 2))
        all_recall += hits / tst_num
        all_ndcg += dcg / max_dcg
        all_precision += hits / topk
    return all_recall, all_ndcg, all_precision


def test_eval_batch_matches_reference(rng):
    U, I, d, B, topk = 30, 25, 8, 16, 5
    u_final = rng.standard_normal((U, d)).astype(np.float32)
    i_final = rng.standard_normal((I, d)).astype(np.float32)
    train_dense = (rng.random((U, I)) < 0.2).astype(np.int8)
    users = rng.choice(U, size=B, replace=False).astype(np.int32)

    # per-user test items, variable count
    counts = rng.integers(1, 7, size=B).astype(np.int32)
    max_t = int(counts.max())
    test_items = np.full((B, max_t), -1, dtype=np.int32)
    test_lists = []
    for b in range(B):
        its = rng.choice(I, size=counts[b], replace=False).astype(np.int32)
        test_items[b, : counts[b]] = its
        test_lists.append(list(its))

    got = make_eval_batch(topk)(
        jnp.asarray(u_final),
        jnp.asarray(i_final),
        jnp.asarray(users),
        jnp.ones(B, dtype=bool),
        jnp.asarray(train_dense),
        jnp.asarray(test_items),
        jnp.asarray(counts),
        dcg_table(topk),
    )

    # brute-force reference path
    mask = train_dense[users].astype(np.float32)
    scores = (u_final[users] @ i_final.T) * (1 - mask) - mask * 1e8
    top = np.argsort(-scores, axis=1)[:, :topk]
    want = _reference_calc_res(top, test_lists, topk)

    np.testing.assert_allclose(float(got.recall), want[0], rtol=1e-5)
    np.testing.assert_allclose(float(got.ndcg), want[1], rtol=1e-5)
    np.testing.assert_allclose(float(got.precision), want[2], rtol=1e-5)


def test_eval_batch_padding_ignored(rng):
    U, I, d, topk = 10, 12, 4, 3
    u_final = rng.standard_normal((U, d)).astype(np.float32)
    i_final = rng.standard_normal((I, d)).astype(np.float32)
    train_dense = np.zeros((U, I), dtype=np.int8)
    users = np.array([1, 2, 1, 1], dtype=np.int32)
    valid = np.array([True, True, False, False])
    test_items = np.array([[0, 1], [2, -1], [0, 1], [0, 1]], dtype=np.int32)
    counts = np.array([2, 1, 2, 2], dtype=np.int32)
    full = make_eval_batch(topk)(
        jnp.asarray(u_final), jnp.asarray(i_final), jnp.asarray(users),
        jnp.asarray(valid), jnp.asarray(train_dense), jnp.asarray(test_items),
        jnp.asarray(counts), dcg_table(topk),
    )
    sub = make_eval_batch(topk)(
        jnp.asarray(u_final), jnp.asarray(i_final), jnp.asarray(users[:2]),
        jnp.ones(2, dtype=bool), jnp.asarray(train_dense),
        jnp.asarray(test_items[:2]), jnp.asarray(counts[:2]), dcg_table(topk),
    )
    np.testing.assert_allclose(float(full.recall), float(sub.recall), rtol=1e-6)
    np.testing.assert_allclose(float(full.ndcg), float(sub.ndcg), rtol=1e-6)
