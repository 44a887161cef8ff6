"""Loss ops against torch-CPU ports of the reference implementations
(reference `Utils/Utils.py:45-98`)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from diffmm_tpu.ops.losses import bpr_loss, info_nce, l2_normalize, l2_reg_loss


def _torch_bpr(u, p, n):
    pos = torch.mul(u, p).sum(dim=1)
    neg = torch.mul(u, n).sum(dim=1)
    return -torch.log(10e-6 + torch.sigmoid(pos - neg)).mean()


def _torch_infonce(v1, v2, idx, temp):
    v1, v2 = v1[idx], v2[idx]
    v1, v2 = F.normalize(v1, p=2, dim=1), F.normalize(v2, p=2, dim=1)
    score = torch.diag(F.log_softmax((v1 @ v2.T) / temp, dim=1))
    return -score.mean()


def test_bpr_matches_torch(rng):
    u = rng.standard_normal((32, 8)).astype(np.float32)
    p = rng.standard_normal((32, 8)).astype(np.float32)
    n = rng.standard_normal((32, 8)).astype(np.float32)
    got = float(bpr_loss(jnp.asarray(u), jnp.asarray(p), jnp.asarray(n)))
    want = float(_torch_bpr(torch.tensor(u), torch.tensor(p), torch.tensor(n)))
    assert abs(got - want) < 1e-5


def test_infonce_matches_torch(rng):
    v1 = rng.standard_normal((40, 8)).astype(np.float32)
    v2 = rng.standard_normal((40, 8)).astype(np.float32)
    idx = rng.integers(0, 40, size=16)  # duplicates allowed
    got = float(info_nce(jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(idx), 0.2))
    want = float(
        _torch_infonce(torch.tensor(v1), torch.tensor(v2), torch.tensor(idx), 0.2)
    )
    assert abs(got - want) < 1e-5


def test_l2_reg(rng):
    a = rng.standard_normal((5, 4)).astype(np.float32)
    b = rng.standard_normal((3, 4)).astype(np.float32)
    got = float(l2_reg_loss(0.01, [jnp.asarray(a), jnp.asarray(b)]))
    want = 0.01 * (np.sum(a**2) + np.sum(b**2))
    assert abs(got - want) < 1e-5


def test_l2_normalize_matches_torch(rng):
    x = rng.standard_normal((10, 6)).astype(np.float32)
    x[0] = 0.0  # zero row: torch clamps denominator at eps
    got = np.asarray(l2_normalize(jnp.asarray(x), axis=1))
    want = F.normalize(torch.tensor(x), p=2, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
