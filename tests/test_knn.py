"""KNN modality-graph ablation vs a numpy reimplementation of the reference
semantics (reference `Main.py:118-134`)."""

import copy

import jax.numpy as jnp
import numpy as np

from diffmm_tpu.data.loader import to_device
from diffmm_tpu.ops.knn import knn_edges
from diffmm_tpu.train.coach import Coach
import pytest


def _reference_knn(rows, cols, feats, user_num, topk):
    proto = np.zeros((user_num, feats.shape[1]), dtype=np.float64)
    for u in range(user_num):
        items = cols[rows == u]
        if len(items):
            proto[u] = feats[items].mean(axis=0)
    pn = proto / np.maximum(np.linalg.norm(proto, axis=1, keepdims=True), 1e-12)
    fn = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    sim = pn @ fn.T
    return np.argsort(-sim, axis=1, kind="stable")[:, :topk]


def test_knn_edges_match_reference(tiny_data):
    feats = tiny_data.raw_feats[0]
    topk = 5
    rows, cols = knn_edges(
        jnp.asarray(tiny_data.train_rows),
        jnp.asarray(tiny_data.train_cols),
        jnp.asarray(feats),
        tiny_data.user_num,
        topk,
    )
    rows, cols = np.asarray(rows), np.asarray(cols)
    want = _reference_knn(
        tiny_data.train_rows, tiny_data.train_cols, feats.astype(np.float64),
        tiny_data.user_num, topk,
    )
    got = cols.reshape(tiny_data.user_num, topk)
    # compare as sets per user (tie order may differ between argsort/top_k)
    for u in range(tiny_data.user_num):
        assert set(got[u]) == set(want[u]), u
    np.testing.assert_array_equal(
        rows, np.repeat(np.arange(tiny_data.user_num), topk)
    )


def test_knn_edges_tolerate_padded_edges(tiny_data):
    """Sentinel-padded device edge arrays give identical prototypes."""
    data = to_device(tiny_data)
    feats = jnp.asarray(tiny_data.raw_feats[0])
    a = knn_edges(
        jnp.asarray(tiny_data.train_rows), jnp.asarray(tiny_data.train_cols),
        feats, tiny_data.user_num, 4,
    )
    b = knn_edges(data.train_rows, data.train_cols, feats, tiny_data.user_num, 4)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


@pytest.mark.slow
def test_knn_ablation_epoch(tiny_config, tiny_data):
    cfg = copy.deepcopy(tiny_config)
    cfg.hyper.use_knn_adj = True
    coach = Coach(cfg, tiny_data)
    res = coach.train_epoch(0)
    assert np.isfinite(res["Loss"])
    metrics = coach.test_epoch()
    assert 0.0 <= metrics["Recall"] <= 1.0
    # KNN graphs are static — cached across epochs
    first = coach.modal_adjs
    coach.train_epoch(1)
    assert coach.modal_adjs is first
