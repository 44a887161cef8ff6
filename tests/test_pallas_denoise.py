"""Fused Pallas denoiser kernel vs the XLA forward (interpret mode on CPU)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffmm_tpu.models.denoise import denoise_forward, init_denoise_params
from diffmm_tpu.ops.pallas.denoise_mlp import denoise_forward_pallas


@pytest.mark.parametrize("with_modal", [False, True])
def test_pallas_matches_xla_interpret(rng, with_modal):
    item_num, hidden, latdim = 300, 64, 16
    params = init_denoise_params(jax.random.PRNGKey(0), item_num, [hidden], 10, latdim)
    x = jnp.asarray(rng.standard_normal((20, item_num)).astype(np.float32))
    t = jnp.asarray(np.arange(20) % 5)
    feat = (
        jnp.asarray(rng.standard_normal((item_num, latdim)).astype(np.float32))
        if with_modal
        else None
    )
    want = np.asarray(denoise_forward(params, x, t, feat))
    got = np.asarray(denoise_forward_pallas(params, x, t, feat, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_unaligned_shapes(rng):
    """Shapes not multiples of the tile sizes are zero-padded internally."""
    params = init_denoise_params(jax.random.PRNGKey(1), 133, [48], 10, 8)
    x = jnp.asarray(rng.standard_normal((7, 133)).astype(np.float32))
    t = jnp.asarray(np.arange(7) % 5)
    want = np.asarray(denoise_forward(params, x, t))
    got = np.asarray(denoise_forward_pallas(params, x, t, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multi_hidden_rejected(tiny_config, tiny_data):
    from diffmm_tpu.train.coach import Coach

    cfg = copy.deepcopy(tiny_config)
    cfg.base.denoise_dim = "[32, 16]"
    cfg.base.denoiser_impl = "pallas"
    with pytest.raises(ValueError, match="single hidden layer"):
        Coach(cfg, tiny_data)
