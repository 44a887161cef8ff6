"""Dataset tooling CLI (C16 — reference `notebooks/mkdata.ipynb` cells 0-5,
`notebooks/CheckData.ipynb`): build from a ui-dict, invariant checks,
subsample round-trips, and loadability of the result through the framework's
own data handler.
"""

import json
import os
import pickle
import sys

import numpy as np
import pytest
import scipy.sparse as sp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import dataset_tools  # noqa: E402


@pytest.fixture()
def built_dir(tmp_path, rng):
    """Build a small dataset from a synthetic ui-dict (mkdata cells 0-3)."""
    ui = {
        f"u{u}": [f"it{i}" for i in rng.choice(40, size=rng.integers(4, 12), replace=False)]
        for u in range(30)
    }
    ui_path = tmp_path / "ui.json"
    ui_path.write_text(json.dumps(ui))
    out = tmp_path / "built"
    rc = dataset_tools.main(
        ["build", "--ui-dict", str(ui_path), "--out", str(out), "--seed", "5"]
    )
    assert rc == 0
    return str(out), ui


def test_build_produces_consistent_splits(built_dir):
    out, ui = built_dir
    mats = {}
    for name in ("trnMat.pkl", "valMat.pkl", "tstMat.pkl"):
        with open(os.path.join(out, name), "rb") as fh:
            mats[name] = sp.coo_matrix(pickle.load(fh))
    shapes = {m.shape for m in mats.values()}
    assert len(shapes) == 1
    user_num, item_num = shapes.pop()
    assert user_num == len(ui)
    assert item_num == len({it for items in ui.values() for it in items})
    # splits are disjoint and cover every interaction exactly once
    total = sum(m.nnz for m in mats.values())
    assert total == sum(len(set(items)) for items in ui.values())
    keysets = [
        set(zip(m.row.tolist(), m.col.tolist())) for m in mats.values()
    ]
    assert not (keysets[0] & keysets[1])
    assert not (keysets[0] & keysets[2])
    assert not (keysets[1] & keysets[2])
    # every user with >2 interactions holds out at least one test item
    # (uid = insertion position in the ui-dict, matching cmd_build's user2id)
    tst_users = set(mats["tstMat.pkl"].row.tolist())
    for uid, (user, items) in enumerate(ui.items()):
        if len(set(items)) > 2:
            assert uid in tst_users, user


def test_check_passes_on_built(built_dir, capsys):
    out, _ = built_dir
    rc = dataset_tools.main(["check", out])
    captured = capsys.readouterr().out
    assert rc == 0
    assert "OK" in captured


def test_check_fails_on_feature_row_mismatch(built_dir, capsys):
    out, _ = built_dir
    np.save(os.path.join(out, "image_feat.npy"), np.zeros((3, 8), np.float16))
    rc = dataset_tools.main(["check", out])
    captured = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in captured


def test_subsample_roundtrip(built_dir, tmp_path):
    out, _ = built_dir
    np.save(
        os.path.join(out, "image_feat.npy"),
        np.arange(40 * 8, dtype=np.float16).reshape(40, 8),
    )
    sub = tmp_path / "sub"
    rc = dataset_tools.main(
        ["subsample", out, "--users", "10", "--items", "20", "--out", str(sub)]
    )
    assert rc == 0
    with open(sub / "trnMat.pkl", "rb") as fh:
        mat = sp.coo_matrix(pickle.load(fh))
    assert mat.shape == (10, 20)
    with open(os.path.join(out, "trnMat.pkl"), "rb") as fh:
        full = sp.coo_matrix(pickle.load(fh)).tocsr()[:10, :20].tocoo()
    assert mat.nnz == full.nnz
    feats = np.load(sub / "image_feat.npy")
    assert feats.shape == (20, 8)
    np.testing.assert_array_equal(
        feats, np.arange(40 * 8, dtype=np.float16).reshape(40, 8)[:20]
    )


def test_built_dataset_loads_through_data_handler(built_dir, tmp_path):
    """The tool's output is a valid framework dataset (loader ingests it,
    synthesizing the absent feature blobs)."""
    out, _ = built_dir
    from diffmm_tpu.config import Config
    from diffmm_tpu.data.loader import load_host_data

    root = os.path.dirname(out)
    cfg = Config()
    cfg.data.name = os.path.basename(out)
    host = load_host_data(cfg, data_root=root)
    assert host.user_num == 30
    assert host.nnz > 0
    assert len(host.raw_feats) >= 2
