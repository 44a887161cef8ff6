"""Dataset construction / inspection / subsampling CLI.

Script equivalent of the reference's offline notebooks (C16, SURVEY.md §2.1:
`notebooks/mkdata.ipynb`, `notebooks/CheckData.ipynb`) — the dataset tooling a
user of the reference would reach for, as reproducible commands:

  python tools/dataset_tools.py info <dataset_dir>
  python tools/dataset_tools.py check <dataset_dir>
  python tools/dataset_tools.py build --ui-dict ui.json --out <dir> \
      [--image-emb f.safetensors --text-emb ...] [--val 0.1 --test 0.2]
  python tools/dataset_tools.py subsample <dataset_dir> --users N --items M \
      --out <dir>
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np
import scipy.sparse as sp


def _load_mat(path: str) -> sp.coo_matrix:
    with open(path, "rb") as fh:
        mat = pickle.load(fh)
    return sp.coo_matrix(mat)


def _save_mat(mat: sp.coo_matrix, path: str) -> None:
    with open(path, "wb") as fh:
        pickle.dump(mat.tocoo(), fh)


def _load_emb(path: str) -> dict[str, np.ndarray]:
    """Load item->vector embeddings (a keyed .safetensors mapping; a plain
    .npy array has no item keys to align against the id map)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    raise ValueError(f"expected a .safetensors mapping for --*-emb, got {path}")


def cmd_info(args) -> int:
    """Shapes + nnz of all matrices and features (mkdata cells 1,3)."""
    for name in ("trnMat.pkl", "valMat.pkl", "tstMat.pkl"):
        path = os.path.join(args.dir, name)
        if not os.path.exists(path):
            print(f"{name}: MISSING")
            continue
        mat = _load_mat(path)
        print(f"{name}: shape={mat.shape} nnz={mat.nnz}")
    for name in ("image_feat.npy", "text_feat.npy", "audio_feat.npy"):
        path = os.path.join(args.dir, name)
        if os.path.exists(path):
            feats = np.load(path)
            print(f"{name}: shape={feats.shape} dtype={feats.dtype}")
    return 0


def cmd_check(args) -> int:
    """Dataset invariants (CheckData.ipynb cells 10-24): binary ratings,
    consistent shapes, feature row counts, degree stats."""
    ok = True
    mats = {}
    for name in ("trnMat.pkl", "valMat.pkl", "tstMat.pkl"):
        path = os.path.join(args.dir, name)
        if os.path.exists(path):
            mats[name] = _load_mat(path)
    if not mats:
        print("no matrices found")
        return 1
    shapes = {m.shape for m in mats.values()}
    if len(shapes) != 1:
        print(f"FAIL: inconsistent matrix shapes: {shapes}")
        ok = False
    for name, mat in mats.items():
        vals = np.unique(mat.data)
        if not np.all(np.isin(vals, [0.0, 1.0])):
            print(f"WARN: {name} has non-binary ratings {vals[:5]} (will be binarized)")
        dup = mat.tocsr()
        dup.sum_duplicates()
        if dup.nnz != mat.nnz:
            print(f"WARN: {name} has {mat.nnz - dup.nnz} duplicate entries")
    (user_num, item_num) = next(iter(shapes))
    for name in ("image_feat.npy", "text_feat.npy", "audio_feat.npy"):
        path = os.path.join(args.dir, name)
        if os.path.exists(path):
            feats = np.load(path)
            if feats.shape[0] != item_num:
                print(f"FAIL: {name} rows {feats.shape[0]} != item_num {item_num}")
                ok = False
    trn = mats.get("trnMat.pkl")
    if trn is not None:
        deg = np.bincount(trn.row, minlength=user_num)
        print(
            f"users={user_num} items={item_num} trn_nnz={trn.nnz} "
            f"mean_degree={deg.mean():.2f} max_degree={deg.max()} "
            f"zero_degree_users={(deg == 0).sum()}"
        )
        if (deg == 0).sum():
            print("WARN: users without train interactions (rebuild skips them)")
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


def cmd_build(args) -> int:
    """Build a dataset from a ui_dict.json (+ optional embedding files)
    (mkdata cells 0-3): id-map users/items, split train/val/test per user,
    save COO pickles + per-item feature matrices."""
    rng = np.random.default_rng(args.seed)
    with open(args.ui_dict) as fh:
        ui_dict = json.load(fh)

    user2id = {u: i for i, u in enumerate(ui_dict)}
    item_set = sorted({it for items in ui_dict.values() for it in items})
    item2id = {it: i for i, it in enumerate(item_set)}
    user_num, item_num = len(user2id), len(item2id)

    rows = {"trn": [], "val": [], "tst": []}
    cols = {"trn": [], "val": [], "tst": []}
    for user, items in ui_dict.items():
        uid = user2id[user]
        iids = np.array([item2id[it] for it in items], dtype=np.int64)
        rng.shuffle(iids)
        n = len(iids)
        n_tst = max(1, int(n * args.test)) if n > 2 else 0
        n_val = max(1, int(n * args.val)) if n > 2 else 0
        splits = {
            "tst": iids[:n_tst],
            "val": iids[n_tst : n_tst + n_val],
            "trn": iids[n_tst + n_val :],
        }
        for split, ids in splits.items():
            rows[split].extend([uid] * len(ids))
            cols[split].extend(ids.tolist())

    os.makedirs(args.out, exist_ok=True)
    for split, fname in (("trn", "trnMat.pkl"), ("val", "valMat.pkl"), ("tst", "tstMat.pkl")):
        mat = sp.coo_matrix(
            (np.ones(len(rows[split]), dtype=np.float32), (rows[split], cols[split])),
            shape=(user_num, item_num),
        )
        _save_mat(mat, os.path.join(args.out, fname))
        print(f"{fname}: shape={mat.shape} nnz={mat.nnz}")

    for modal, path in (("image", args.image_emb), ("text", args.text_emb), ("audio", args.audio_emb)):
        if not path:
            continue
        embs = _load_emb(path)
        feats = np.stack(
            [embs[item] for item in item_set], axis=0
        ).astype(np.float16)
        out = os.path.join(args.out, f"{modal}_feat.npy")
        np.save(out, feats)
        print(f"{modal}_feat.npy: shape={feats.shape}")
    return 0


def cmd_subsample(args) -> int:
    """Subsample a dataset to its first N users / M items, keeping matrices
    and features consistent (mkdata cell 5, the *_tiny construction)."""
    os.makedirs(args.out, exist_ok=True)
    for name in ("trnMat.pkl", "valMat.pkl", "tstMat.pkl"):
        path = os.path.join(args.dir, name)
        if not os.path.exists(path):
            continue
        mat = _load_mat(path).tocsr()[: args.users, : args.items].tocoo()
        _save_mat(mat, os.path.join(args.out, name))
        print(f"{name}: shape={mat.shape} nnz={mat.nnz}")
    for name in ("image_feat.npy", "text_feat.npy", "audio_feat.npy"):
        path = os.path.join(args.dir, name)
        if os.path.exists(path):
            feats = np.load(path)[: args.items]
            np.save(os.path.join(args.out, name), feats)
            print(f"{name}: shape={feats.shape}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info")
    p.add_argument("dir")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("check")
    p.add_argument("dir")
    p.set_defaults(fn=cmd_check)

    p = sub.add_parser("build")
    p.add_argument("--ui-dict", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--image-emb")
    p.add_argument("--text-emb")
    p.add_argument("--audio-emb")
    p.add_argument("--val", type=float, default=0.1)
    p.add_argument("--test", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_build)

    p = sub.add_parser("subsample")
    p.add_argument("dir")
    p.add_argument("--users", type=int, required=True)
    p.add_argument("--items", type=int, required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_subsample)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
