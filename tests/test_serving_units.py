"""Fast unit tests for the serving index's CSR seen-list machinery.

The integration serving tests (tests/test_serving.py) are slow-marked; these
cover the pure host/device helpers in the fast core loop: CSR construction,
the per-request padded gather (clipping, pad values, empty CSR), and the
variant fingerprint the compile bookkeeping keys on.
"""

import jax.numpy as jnp
import numpy as np

from diffmm_tpu.eval.serving import (
    RecIndex,
    _gather_seen,
    _index_fingerprint,
    seen_csr_from_edges,
)


def test_csr_from_edges_matches_bruteforce():
    rows = np.array([2, 0, 2, 1, 2, 0], dtype=np.int32)
    cols = np.array([5, 1, 7, 3, 9, 4], dtype=np.int32)
    indptr, indices, width = seen_csr_from_edges(rows, cols, user_num=4)
    assert indptr.tolist() == [0, 2, 3, 6, 6]
    # user-major, original order within a user (stable sort)
    assert indices.tolist() == [1, 4, 3, 5, 7, 9]
    assert int(width) == 3  # user 2's degree
    assert indices.nbytes == len(rows) * 4  # O(nnz), no padding


def test_csr_empty_edges():
    indptr, indices, width = seen_csr_from_edges(
        np.array([], dtype=np.int32), np.array([], dtype=np.int32), user_num=3
    )
    assert indptr.tolist() == [0, 0, 0, 0]
    assert len(indices) == 0 and int(width) == 1


def test_gather_seen_pads_and_bounds():
    indptr = jnp.asarray([0, 2, 3, 6, 6], dtype=jnp.int32)
    indices = jnp.asarray([1, 4, 3, 5, 7, 9], dtype=jnp.int32)
    item_num = 10
    users = jnp.asarray([0, 2, 3], dtype=jnp.int32)
    seen = np.asarray(_gather_seen(indptr, indices, users, 3, item_num))
    assert seen.shape == (3, 3)
    assert seen[0].tolist() == [1, 4, item_num]  # degree 2 -> 1 pad
    assert seen[1].tolist() == [5, 7, 9]  # exactly max degree
    assert seen[2].tolist() == [item_num] * 3  # degree 0 (incl. last user:
    # its positions clip at nnz-1, the mask must still pad them all)


def test_gather_seen_empty_csr():
    indptr = jnp.zeros(4, dtype=jnp.int32)
    indices = jnp.zeros((0,), dtype=jnp.int32)
    users = jnp.asarray([0, 2], dtype=jnp.int32)
    seen = np.asarray(_gather_seen(indptr, indices, users, 1, item_num=7))
    assert (seen == 7).all()


def test_fingerprint_tracks_width_and_shapes():
    def idx(width, nnz):
        return RecIndex(
            u_final=jnp.zeros((4, 2)),
            i_final=jnp.zeros((6, 2)),
            seen_indptr=jnp.zeros(5, jnp.int32),
            seen_indices=jnp.zeros(nnz, jnp.int32),
            seen_width=np.int32(width),
        )

    a, b = _index_fingerprint(idx(3, 8)), _index_fingerprint(idx(3, 8))
    assert a == b and hash(a) == hash(b)
    # a different max degree compiles a different gather -> distinct variant
    assert _index_fingerprint(idx(4, 8)) != a
    assert _index_fingerprint(idx(3, 9)) != a
