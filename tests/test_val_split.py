"""Validation-split eval (additive: the reference ships valMat.pkl but never
loads it, `DataHandler.py:30-31`)."""

import copy
import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from diffmm_tpu.config import Config
from diffmm_tpu.data.loader import group_eval_split, load_host_data
from diffmm_tpu.train.coach import Coach


def _write_ds(tmp_path, user_num=30, item_num=24, seed=0):
    rng = np.random.default_rng(seed)
    d = tmp_path / "toyset"
    d.mkdir()

    def mat(density):
        dense = (rng.random((user_num, item_num)) < density).astype(np.float32)
        dense[:, 0] = 1.0  # every user trains on >= 1 item
        return sp.coo_matrix(dense)

    for name, density in (("trnMat.pkl", 0.2), ("valMat.pkl", 0.05), ("tstMat.pkl", 0.05)):
        with open(d / name, "wb") as fh:
            pickle.dump(mat(density), fh)
    np.save(d / "image_feat.npy", rng.standard_normal((item_num, 8)).astype(np.float32))
    np.save(d / "text_feat.npy", rng.standard_normal((item_num, 6)).astype(np.float32))
    return str(tmp_path)


def test_group_eval_split_basic():
    mat = sp.coo_matrix(
        (np.ones(4, np.float32), ([2, 0, 2, 5], [1, 3, 0, 2])), shape=(6, 4)
    )
    users, items, counts = group_eval_split(mat)
    np.testing.assert_array_equal(users, [0, 2, 5])
    np.testing.assert_array_equal(counts, [1, 2, 1])
    assert items.shape == (3, 2)
    np.testing.assert_array_equal(items[1], [0, 1])
    assert items[0, 1] == -1


@pytest.mark.slow
def test_val_split_eval(tmp_path, monkeypatch):
    root = _write_ds(tmp_path)
    monkeypatch.setenv("DIFFMM_DATA_ROOT", root)
    monkeypatch.setitem(
        __import__("diffmm_tpu.data.loader", fromlist=["MODALITIES"]).MODALITIES,
        "toyset",
        ["image", "text"],
    )
    cfg = Config()
    cfg.data.name = "toyset"
    cfg.base.latdim = 8
    cfg.base.denoise_dim = "[16]"
    cfg.train.batch = 16
    cfg.train.test_batch = 8
    host = load_host_data(cfg)
    assert host.val_users is not None
    coach = Coach(cfg, host)
    coach.train_epoch(0)
    m_test = coach.test_epoch("test")
    m_val = coach.test_epoch("val")
    for m in (m_test, m_val):
        assert 0.0 <= m["Recall"] <= 1.0
    with pytest.raises(ValueError, match="unknown eval split"):
        coach.test_epoch("train")


@pytest.mark.slow
def test_val_missing_raises(tiny_config, tiny_data):
    coach = Coach(copy.deepcopy(tiny_config), tiny_data)
    coach.train_epoch(0)
    with pytest.raises(ValueError, match="no valMat"):
        coach.test_epoch("val")


@pytest.mark.slow
def test_drop_missing_modalities(tmp_path, monkeypatch):
    """data.missing_modalities='drop' trains without the unshipped blob."""
    root = _write_ds(tmp_path, seed=4)
    import os
    os.remove(os.path.join(root, "toyset", "text_feat.npy"))
    monkeypatch.setenv("DIFFMM_DATA_ROOT", root)
    monkeypatch.setitem(
        __import__("diffmm_tpu.data.loader", fromlist=["MODALITIES"]).MODALITIES,
        "toyset",
        ["image", "text"],
    )
    cfg = Config()
    cfg.data.name = "toyset"
    cfg.data.missing_modalities = "drop"
    cfg.base.latdim = 8
    cfg.base.denoise_dim = "[16]"
    cfg.train.batch = 16
    cfg.train.test_batch = 8
    host = load_host_data(cfg)
    assert host.modalities == ["image"]
    assert host.synthesized == ["text (dropped)"]
    coach = Coach(cfg, host)
    res = coach.train_epoch(0)
    assert "text loss" not in res and "image loss" in res


def test_svd_tfidf_and_rank_synthesis(tmp_path, monkeypatch):
    """svd_tfidf synthesizes IDF-weighted co-occurrence features; the rank
    cap zero-pads beyond the leading directions."""
    import os

    import numpy as np

    root = _write_ds(tmp_path, seed=9)
    os.remove(os.path.join(root, "toyset", "text_feat.npy"))
    monkeypatch.setenv("DIFFMM_DATA_ROOT", root)
    monkeypatch.setenv("DIFFMM_FEAT_CACHE", "0")
    monkeypatch.setitem(
        __import__("diffmm_tpu.data.loader", fromlist=["MODALITIES"]).MODALITIES,
        "toyset",
        ["image", "text"],
    )
    cfg = Config()
    cfg.data.name = "toyset"
    cfg.data.missing_modalities = "svd_tfidf"
    cfg.data.synth_svd_rank = 3
    host = load_host_data(cfg)
    assert host.synthesized == ["text"]
    text = host.raw_feats[host.modalities.index("text")]
    feats = np.asarray(text)
    # rank cap: only the first 3 columns carry signal, the rest zero-pad
    assert np.abs(feats[:, 3:]).max() == 0.0
    assert np.abs(feats[:, :3]).max() > 0.0

    # tfidf features differ from the unweighted svd features
    cfg2 = Config()
    cfg2.data.name = "toyset"
    cfg2.data.missing_modalities = "svd"
    cfg2.data.synth_svd_rank = 3
    host2 = load_host_data(cfg2)
    feats2 = np.asarray(host2.raw_feats[host2.modalities.index("text")])
    assert not np.allclose(feats[:, :3], feats2[:, :3])
