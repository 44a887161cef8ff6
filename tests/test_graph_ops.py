"""SpMM / normalization parity against scipy (the reference's host path,
reference `DataHandler.py:52-93`)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from diffmm_tpu.ops.graph import (
    bi_adj_to_dense,
    build_bi_adj_device,
    build_bi_adj_host,
    spmm_bi,
)


def _reference_norm_adj(rows, cols, U, I):
    """Scipy mirror of reference DataHandler.makeTorchAdj + normalizeAdj."""
    mat = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(U, I))
    a = sp.csr_matrix((U, U))
    b = sp.csr_matrix((I, I))
    adj = sp.vstack([sp.hstack([a, mat]), sp.hstack([mat.T, b])]).tocoo()
    adj = (adj != 0) * 1.0
    adj = (adj + sp.eye(adj.shape[0])) * 1.0
    csr = adj.tocsr()
    degree = np.asarray(csr.sum(axis=1)).squeeze()
    d_inv_sqrt = np.where(degree > 0, degree**-0.5, 0)
    d_mat = sp.diags(d_inv_sqrt)
    return (d_mat @ adj @ d_mat).toarray()


def _random_edges(rng, U, I, nnz):
    pairs = set()
    while len(pairs) < nnz:
        pairs.add((int(rng.integers(U)), int(rng.integers(I))))
    rows, cols = map(np.array, zip(*sorted(pairs)))
    return rows.astype(np.int32), cols.astype(np.int32)


def test_bi_adj_matches_scipy(rng):
    U, I = 17, 23
    rows, cols = _random_edges(rng, U, I, 60)
    adj = build_bi_adj_host(rows, cols, U, I)
    dense = np.asarray(bi_adj_to_dense(adj))
    want = _reference_norm_adj(rows, cols, U, I)
    np.testing.assert_allclose(dense, want, rtol=1e-6, atol=1e-6)


def test_spmm_matches_dense(rng):
    U, I, d = 11, 13, 8
    rows, cols = _random_edges(rng, U, I, 30)
    adj = build_bi_adj_host(rows, cols, U, I)
    x_u = jnp.asarray(rng.standard_normal((U, d)), dtype=jnp.float32)
    x_i = jnp.asarray(rng.standard_normal((I, d)), dtype=jnp.float32)
    y_u, y_i = spmm_bi(adj, x_u, x_i)
    dense = np.asarray(bi_adj_to_dense(adj))
    x = np.concatenate([np.asarray(x_u), np.asarray(x_i)])
    want = dense @ x
    np.testing.assert_allclose(np.asarray(y_u), want[:U], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_i), want[U:], rtol=1e-5, atol=1e-5)


def test_device_build_matches_host(rng):
    U, I = 9, 12
    rows, cols = _random_edges(rng, U, I, 25)
    host_adj = build_bi_adj_host(rows, cols, U, I)
    dev_adj = build_bi_adj_device(jnp.asarray(rows), jnp.asarray(cols), U, I)
    np.testing.assert_allclose(
        np.asarray(bi_adj_to_dense(dev_adj)),
        np.asarray(bi_adj_to_dense(host_adj)),
        rtol=1e-6,
        atol=1e-6,
    )


def test_isolated_nodes_get_selfloop_only(rng):
    # users/items with zero degree: deg+1 = 1, s = 1, y = x for those rows
    U, I = 6, 6
    rows = np.array([0, 1], dtype=np.int32)
    cols = np.array([0, 1], dtype=np.int32)
    adj = build_bi_adj_host(rows, cols, U, I)
    x_u = jnp.ones((U, 4), dtype=jnp.float32)
    x_i = jnp.ones((I, 4), dtype=jnp.float32)
    y_u, y_i = spmm_bi(adj, x_u, x_i)
    # isolated user 5 keeps exactly its own embedding (self-loop weight 1)
    np.testing.assert_allclose(np.asarray(y_u)[5], np.ones(4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y_i)[5], np.ones(4), rtol=1e-6)
