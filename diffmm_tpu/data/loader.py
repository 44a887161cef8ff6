"""Host-side dataset ingest -> device-resident static-shape arrays.

Parity target: reference `DataHandler.py` (pickled scipy COO train/test
matrices + ``.npy`` modality features, binarized, symmetric-normalized
bipartite adjacency, per-user degrees). Differences by design:

* Everything needed per epoch lives on device once, in static shapes — the
  reference's per-epoch host round-trips (DOK negative sampling, edge-list
  building, scipy renormalization; SURVEY.md §3.2) are all eliminated.
* The dense train matrix (the reference materializes it as a device f32
  tensor, `DataHandler.py:128`) is stored as int8 and cast per-batch: it
  serves diffusion rows, the eval train-mask, and O(1) membership tests for
  vectorized negative sampling.
* Missing feature blobs (the mounted reference dataset lacks e.g. tiktok
  ``text_feat.npy``) are synthesized deterministically with the documented
  shape/dtype so every config stays runnable; a warning is logged.
"""

from __future__ import annotations

import os
import pickle
import warnings
import zlib
from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from diffmm_tpu.config import Config
from diffmm_tpu.ops.graph import BiAdj, build_bi_adj_host

# Modality layout per dataset (reference `DataHandler.py:33-37`: all datasets
# have image+text; only tiktok has audio).
MODALITIES = {"tiktok": ["image", "text", "audio"]}
DEFAULT_MODALITIES = ["image", "text"]

# Documented feature dims for synthesizing missing blobs (BASELINE.md table).
_SYNTH_FEAT_DIMS = {
    ("tiktok", "image"): 128,
    ("tiktok", "text"): 768,
    ("tiktok", "audio"): 128,
    ("baby", "image"): 4096,
    ("baby", "text"): 1024,
    ("sports", "image"): 4096,
    ("sports", "text"): 1024,
    ("yelp", "image"): 4096,
    ("yelp", "text"): 1024,
    ("ifashion", "image"): 4096,
    ("ifashion", "text"): 1024,
}


def modality_names(dataset: str) -> list[str]:
    return MODALITIES.get(dataset, DEFAULT_MODALITIES)


def resolve_data_dir(name: str, explicit_root: str | None = None) -> str:
    """Locate ``<root>/<name>/`` among the usual candidates."""
    candidates = []
    if explicit_root:
        candidates.append(explicit_root)
    env_root = os.environ.get("DIFFMM_DATA_ROOT")
    if env_root:
        candidates.append(env_root)
    candidates += ["./Datasets", "/root/reference/Datasets"]
    for root in candidates:
        path = os.path.join(root, name)
        if os.path.isdir(path):
            return path
    raise FileNotFoundError(
        f"Dataset {name!r} not found under any of {candidates}; "
        "set DIFFMM_DATA_ROOT or pass data_root."
    )


def load_interactions(path: str) -> sp.coo_matrix:
    """Unpickle + binarize an interaction matrix (reference `DataHandler.py:41-50`)."""
    with open(path, "rb") as fh:
        mat = pickle.load(fh)
    mat = (mat != 0).astype(np.float32)
    if not isinstance(mat, sp.coo_matrix):
        mat = sp.coo_matrix(mat)
    return mat


def _synthesize_features(
    name: str,
    modality: str,
    item_num: int,
    mode: str = "zeros",
    train: "sp.spmatrix | None" = None,
    svd_rank: int = 0,
) -> np.ndarray:
    """Stand-in for an unshipped feature blob.

    ``zeros`` (default) makes the modality uninformative so its learned
    softmax weight can suppress it — measured better on tiktok (Recall@20
    0.1072 vs 0.1049) than ``randn`` fixed gaussian pseudo-features.
    ``svd`` replaces the blob with item co-occurrence structure: the top
    singular directions of the train matrix (scaled by singular values,
    variance-normalized), so the modality branch carries real collaborative
    signal instead of a constant — the closest available analogue of the
    content embedding the blob would have held. ``svd_tfidf`` decomposes
    the IDF-weighted matrix instead (entry u,i scaled by
    ``log((U+1)/(deg_i+1))`` — popular items down-weighted, so the
    directions capture taste niches rather than popularity).
    ``svd_rank`` (``data.synth_svd_rank``): cap the decomposition rank
    below the blob dim (pad with zeros) — the leading directions carry
    most of the signal and small ranks both regularize and compute faster.
    """
    dim = _SYNTH_FEAT_DIMS.get((name, modality), 64)
    if mode == "zeros":
        return np.zeros((item_num, dim), dtype=np.float32)
    if mode in ("svd", "svd_tfidf"):
        assert train is not None
        mat = sp.csr_matrix(train, dtype=np.float32)
        if mode == "svd_tfidf":
            deg_i = np.asarray(mat.sum(axis=0)).ravel()
            idf = np.log((mat.shape[0] + 1.0) / (deg_i + 1.0)).astype(
                np.float32
            )
            mat = sp.csr_matrix(mat.multiply(idf[None, :]))
        k = min(dim, min(mat.shape) - 1)
        if svd_rank and svd_rank > 0:
            k = min(k, svd_rank)
        if k < 1:  # degenerate 1-user/1-item matrix: nothing to decompose
            return np.zeros((item_num, dim), dtype=np.float32)
        feats = _train_svd_feats(mat, k)
        if k < dim:
            feats = np.pad(feats, ((0, 0), (0, dim - k)))
        return feats
    # stable content seed — builtin hash() is salted per process
    # (PYTHONHASHSEED), which would make randn features differ across runs
    seed = zlib.crc32(f"{name}/{modality}".encode())
    rng = np.random.default_rng(seed)
    return rng.standard_normal((item_num, dim), dtype=np.float32)


_SVD_MEM_CACHE: dict = {}


def _train_svd_feats(mat: "sp.csr_matrix", k: int) -> np.ndarray:
    """Variance-normalized top-``k`` right singular directions of the train
    matrix, scaled by singular values — disk+memory cached.

    The Lanczos run is deterministic (fixed start vector) but expensive:
    k=4096 on baby-scale matrices is ~tens of host-CPU minutes, previously
    re-paid by every process (each forked sweep child!). The cache key is
    exact content (shape, nnz, CRCs of the CSR structure), so a hit returns
    bit-identical features; set DIFFMM_FEAT_CACHE=0 to disable, or to a
    directory to relocate (default ``<repo>/data/.feat_cache``)."""
    import os

    key = (
        mat.shape,
        int(mat.nnz),
        zlib.crc32(mat.indices.tobytes()),
        zlib.crc32(mat.indptr.tobytes()),
        zlib.crc32(mat.data.tobytes()),
        k,
    )
    if key in _SVD_MEM_CACHE:
        return _SVD_MEM_CACHE[key]
    cache_env = os.environ.get("DIFFMM_FEAT_CACHE")
    cache_dir = None
    if cache_env != "0":
        cache_dir = cache_env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "data",
            ".feat_cache",
        )
    tag = (
        f"{mat.shape[0]}x{mat.shape[1]}_{mat.nnz}"
        f"_{key[2]:08x}{key[3]:08x}{key[4]:08x}_k{k}"
    )
    path = cache_dir and os.path.join(cache_dir, f"svd_{tag}.npy")
    if path and os.path.exists(path):
        feats = np.load(path)
    else:
        from scipy.sparse.linalg import svds

        # fixed start vector => deterministic Lanczos iteration
        _, s, vt = svds(mat, k=k, v0=np.ones(min(mat.shape), dtype=np.float32))
        feats = (vt.T * s).astype(np.float32)  # (I, k), top directions last
        feats /= max(float(feats.std()), 1e-8)
        if path:
            os.makedirs(cache_dir, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as fh:  # np.save(path) would append .npy
                np.save(fh, feats)
            os.replace(tmp, path)  # atomic: concurrent children don't race
    _SVD_MEM_CACHE[key] = feats
    return feats


@dataclass
class HostData:
    """Everything loaded/derived on host, as numpy."""

    name: str
    user_num: int
    item_num: int
    modalities: list[str]
    feat_dims: list[int]
    # train interactions, user-major sorted
    train_rows: np.ndarray  # (nnz,) int32
    train_cols: np.ndarray  # (nnz,) int32
    user_degrees: np.ndarray  # (U,) int32
    csr_offsets: np.ndarray  # (U,) int32: start of each user's edge span
    k_max: int  # max user degree (static top-k bound)
    raw_feats: list[np.ndarray]  # per modality (I, dim) f32
    # test set
    test_users: np.ndarray  # (Tu,) int32
    test_items: np.ndarray  # (Tu, maxT) int32, padded with -1
    test_counts: np.ndarray  # (Tu,) int32
    synthesized: list[str] = field(default_factory=list)
    # validation set (additive: the reference ships valMat.pkl but never
    # loads it — `DataHandler.py:30-31`; "test" doubles as validation there)
    val_users: np.ndarray | None = None
    val_items: np.ndarray | None = None
    val_counts: np.ndarray | None = None
    # (U, I) int8, built LAZILY by the train_dense property: only the dense
    # membership store reads it (reference `DataHandler.py:128` materializes
    # it unconditionally); the CSR store — the sparse graph form's default —
    # never touches it, so web-scale catalogs never allocate O(U·I) on host.
    _train_dense: np.ndarray | None = None

    @property
    def nnz(self) -> int:
        return int(self.train_rows.shape[0])

    @property
    def train_dense(self) -> np.ndarray:
        if self._train_dense is None:
            dense = np.zeros((self.user_num, self.item_num), dtype=np.int8)
            dense[self.train_rows, self.train_cols] = 1
            self._train_dense = dense
        return self._train_dense


class DeviceData(NamedTuple):
    """Device-resident mirrors used inside jitted steps."""

    adj: BiAdj
    train_rows: jax.Array
    train_cols: jax.Array
    user_degrees: jax.Array
    csr_offsets: jax.Array
    # membership store: (U, I) int8 dense matrix OR an O(nnz) TrainCSR
    # whose arrays alias train_cols/csr_offsets/user_degrees above
    # (data/membership.py — dispatch is by Python type inside the steps)
    train_store: Any
    raw_feats: list[jax.Array]
    test_users: jax.Array
    test_items: jax.Array
    test_counts: jax.Array
    val_users: jax.Array | None
    val_items: jax.Array | None
    val_counts: jax.Array | None


def load_host_data(config: Config, data_root: str | None = None) -> HostData:
    """Load a dataset and fill ``config.data`` shape fields
    (reference `DataHandler.py:107-131`).

    ``name = "synthetic"`` (or ``synthetic:<users>x<items>`` /
    ``synthetic:<users>x<items>x<density>``) generates a random dataset
    with the standard invariants — lets every config run on hosts without
    the (partially unshipped) reference data artifacts; the density form
    reproduces a real catalog's interaction count (e.g. Amazon-Sports
    35598x18357x0.000392 ≈ its 256,308 train edges).
    """
    name = config.data.name
    if name.startswith("synthetic"):
        from diffmm_tpu.data.synthetic import make_synthetic_host_data

        if ":" in name:
            parts = name.split(":", 1)[1].lower().split("x")
            kwargs = {"user_num": int(parts[0]), "item_num": int(parts[1])}
            if len(parts) > 2:
                kwargs["density"] = float(parts[2])
            return make_synthetic_host_data(
                config, seed=config.base.seed, **kwargs
            )
        return make_synthetic_host_data(config, seed=config.base.seed)
    data_dir = resolve_data_dir(name, data_root)

    train = load_interactions(os.path.join(data_dir, "trnMat.pkl"))
    test = load_interactions(os.path.join(data_dir, "tstMat.pkl"))
    user_num, item_num = train.shape
    config.data.user_num, config.data.item_num = int(user_num), int(item_num)

    # User-major sorted edges; stable order inside a user row.
    order = np.lexsort((train.col, train.row))
    rows = train.row.astype(np.int32)[order]
    cols = train.col.astype(np.int32)[order]
    degrees = np.bincount(rows, minlength=user_num).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(degrees[:-1])]).astype(np.int32)

    missing_mode = config.data.missing_modalities
    env_mode = os.environ.get("DIFFMM_SYNTH_MODE")
    if env_mode and env_mode != missing_mode:
        # loud, not silent: the run's synthesized features differ from what
        # the config records (sweep harnesses set this for A/B probes)
        warnings.warn(
            f"DIFFMM_SYNTH_MODE={env_mode!r} overrides "
            f"data.missing_modalities={missing_mode!r}",
            stacklevel=2,
        )
        missing_mode = env_mode
    if missing_mode not in ("zeros", "drop", "randn", "svd", "svd_tfidf"):
        raise ValueError(
            "data.missing_modalities must be zeros|drop|randn|svd|svd_tfidf, "
            f"got {missing_mode!r}"
        )
    mods, raw_feats, feat_dims, synthesized = [], [], [], []
    for mod in modality_names(name):
        path = os.path.join(data_dir, f"{mod}_feat.npy")
        if os.path.exists(path):
            feats = np.load(path).astype(np.float32)
            if feats.shape[0] != item_num:
                raise ValueError(
                    f"{path}: expected {item_num} rows, got {feats.shape[0]}"
                )
        elif missing_mode == "drop":
            synthesized.append(f"{mod} (dropped)")
            continue
        else:
            feats = _synthesize_features(
                name, mod, item_num, missing_mode, train,
                svd_rank=config.data.synth_svd_rank,
            )
            synthesized.append(mod)
        mods.append(mod)
        raw_feats.append(feats)
        feat_dims.append(int(feats.shape[1]))
    if not mods:
        raise FileNotFoundError(
            f"{name}: no modality feature blobs found and "
            "data.missing_modalities='drop' removed them all"
        )

    dim_fields = {"image": "image_feat_dim", "text": "text_feat_dim", "audio": "audio_feat_dim"}
    for mod, dim in zip(mods, feat_dims):
        setattr(config.data, dim_fields[mod], dim)

    # Held-out users + padded per-user item lists (reference
    # `DataHandler.py:179-202`). Order follows first appearance in the COO
    # stream only incidentally in the reference; we sort by user id.
    test_users, test_items, t_counts = group_eval_split(test)
    val_users = val_items = val_counts = None
    val_path = os.path.join(data_dir, "valMat.pkl")
    if os.path.exists(val_path):
        val = load_interactions(val_path)
        val_users, val_items, val_counts = group_eval_split(val)

    return HostData(
        name=name,
        user_num=int(user_num),
        item_num=int(item_num),
        modalities=mods,
        feat_dims=feat_dims,
        train_rows=rows,
        train_cols=cols,
        user_degrees=degrees,
        csr_offsets=offsets,
        k_max=int(degrees.max()),
        raw_feats=raw_feats,
        test_users=test_users,
        test_items=test_items,
        test_counts=t_counts,
        synthesized=synthesized,
        val_users=val_users,
        val_items=val_items,
        val_counts=val_counts,
    )


def group_eval_split(mat: sp.coo_matrix):
    """COO eval matrix -> (users, padded per-user item lists, counts)."""
    rows = mat.row.astype(np.int32)
    cols = mat.col.astype(np.int32)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    users, counts = np.unique(rows, return_counts=True)
    max_n = int(counts.max()) if len(counts) else 1
    items = np.full((len(users), max_n), -1, dtype=np.int32)
    start = 0
    for i, c in enumerate(counts):
        items[i, :c] = cols[start : start + c]
        start += c
    return users.astype(np.int32), items, counts.astype(np.int32)


# Edge arrays are padded to this multiple so the nnz axis shards evenly over
# any realistic data-parallel mesh degree. Pad entries carry the sentinel
# indices (user_num, item_num), which drop out of all segment_sum scatters
# (see ops/graph.py docstrings); overhead is < 256 fake edges.
EDGE_ALIGN = 256


def pad_edges(
    rows: np.ndarray, cols: np.ndarray, user_num: int, item_num: int,
    multiple: int = EDGE_ALIGN,
) -> tuple[np.ndarray, np.ndarray]:
    pad = -len(rows) % multiple
    if pad:
        rows = np.concatenate([rows, np.full(pad, user_num, dtype=np.int32)])
        cols = np.concatenate([cols, np.full(pad, item_num, dtype=np.int32)])
    return rows, cols


def to_device(
    host: HostData,
    with_sparse_adj: bool = True,
    train_store: str = "dense",
    batch: int = 1024,
) -> DeviceData:
    """``with_sparse_adj=False`` skips the host-side sparse adjacency build
    (sorting + iu_perm) for runs on the dense MXU graph form, which replaces
    ``adj`` anyway (train/coach.py).

    ``train_store``: membership representation — "dense" materializes the
    (U, I) int8 matrix (reference `DataHandler.py:128` behavior), "csr"
    builds a :class:`~diffmm_tpu.data.membership.TrainCSR` view over the
    SAME padded edge/offset/degree arrays placed below (zero extra device
    memory; the host-side dense matrix is never built either).
    """
    rows_p, cols_p = pad_edges(
        host.train_rows, host.train_cols, host.user_num, host.item_num
    )
    adj = (
        build_bi_adj_host(rows_p, cols_p, host.user_num, host.item_num)
        if with_sparse_adj
        else None
    )
    train_cols_dev = jnp.asarray(cols_p)
    degrees_dev = jnp.asarray(host.user_degrees)
    offsets_dev = jnp.asarray(host.csr_offsets)
    if train_store == "dense":
        store = jnp.asarray(host.train_dense)
    elif train_store == "csr":
        from diffmm_tpu.data.membership import make_train_csr, plan_head_tail

        # head/tail split for the row scatters (power-law degrees make the
        # uniform k_max pad ~100x the real edges; membership.py docstring)
        k_cut, heavy_ids = plan_head_tail(
            host.user_degrees, host.k_max, block=batch
        )
        store = make_train_csr(
            train_cols_dev, offsets_dev, degrees_dev, host.k_max,
            k_cut, heavy_ids,
        )
    else:
        raise ValueError(
            f"train_store must be dense|csr, got {train_store!r}"
        )
    return DeviceData(
        adj=adj,
        train_rows=jnp.asarray(rows_p),
        train_cols=train_cols_dev,
        user_degrees=degrees_dev,
        csr_offsets=offsets_dev,
        train_store=store,
        raw_feats=[jnp.asarray(f) for f in host.raw_feats],
        test_users=jnp.asarray(host.test_users),
        test_items=jnp.asarray(host.test_items),
        test_counts=jnp.asarray(host.test_counts),
        val_users=None if host.val_users is None else jnp.asarray(host.val_users),
        val_items=None if host.val_items is None else jnp.asarray(host.val_items),
        val_counts=None if host.val_counts is None else jnp.asarray(host.val_counts),
    )
