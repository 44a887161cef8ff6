"""Denoiser forward parity against a torch port of the reference
(reference `Model.py:136-220`), with weights copied from the JAX params."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

import pytest

from diffmm_tpu.models.denoise import (
    denoise_forward,
    init_denoise_params,
    timestep_embedding,
)


def _torch_denoise_forward(params, x_t, timesteps, modal_feat=None):
    """Torch mirror of reference Denoise.forward with the same weights."""
    x_t = torch.tensor(np.asarray(x_t))
    timesteps = torch.tensor(np.asarray(timesteps))
    dim = params["emb"]["w"].shape[0]
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000) * torch.arange(0, half, dtype=torch.float32) / half
    )
    temp = timesteps.unsqueeze(-1).float() * freqs.unsqueeze(0)
    time_emb = torch.cat([torch.cos(temp), torch.sin(temp)], dim=-1)
    if dim % 2:
        time_emb = torch.cat([time_emb, torch.zeros_like(time_emb[:, :1])], dim=-1)

    def lin(layer, h):
        w = torch.tensor(np.asarray(layer["w"]))
        b = torch.tensor(np.asarray(layer["b"]))
        return h @ w + b

    time_emb = lin(params["emb"], time_emb)

    if modal_feat is not None:
        mf = torch.tensor(np.asarray(modal_feat))
        projected = x_t @ mf
        gate = torch.sigmoid(lin(params["gate"], projected))
        x_t = x_t + (projected * gate) @ mf.T

    h = torch.cat([x_t, time_emb], dim=-1)
    for layer in params["in_layers"]:
        h = torch.tanh(lin(layer, h))
    for i, layer in enumerate(params["out_layers"]):
        h = lin(layer, h)
        if i != len(params["out_layers"]) - 1:
            h = torch.tanh(h)
    return h.numpy()


def test_time_embedding_even_odd():
    t = jnp.array([0, 1, 4])
    emb10 = timestep_embedding(t, 10)
    assert emb10.shape == (3, 10)
    # t=0: cos=1, sin=0
    np.testing.assert_allclose(np.asarray(emb10)[0, :5], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb10)[0, 5:], 0.0, atol=1e-6)
    emb11 = timestep_embedding(t, 11)
    assert emb11.shape == (3, 11)
    np.testing.assert_allclose(np.asarray(emb11)[:, -1], 0.0)


def test_forward_matches_torch(rng):
    item_num, latdim = 30, 8
    params = init_denoise_params(
        jax.random.PRNGKey(0), item_num, [16], time_emb_dim=10, latdim=latdim
    )
    x_t = rng.standard_normal((6, item_num)).astype(np.float32)
    t = np.array([0, 1, 2, 3, 4, 2], dtype=np.int32)
    feat = rng.standard_normal((item_num, latdim)).astype(np.float32)

    for mf in (None, feat):
        got = np.asarray(
            denoise_forward(
                params,
                jnp.asarray(x_t),
                jnp.asarray(t),
                None if mf is None else jnp.asarray(mf),
            )
        )
        want = _torch_denoise_forward(params, x_t, t, mf)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_multi_hidden_layers(rng):
    """denoise_dim can be a multi-layer stack, e.g. [64, 32]."""
    params = init_denoise_params(jax.random.PRNGKey(1), 20, [64, 32], 10, 8)
    x = jnp.asarray(rng.standard_normal((4, 20)).astype(np.float32))
    out = denoise_forward(params, x, jnp.array([0, 1, 2, 3]))
    assert out.shape == (4, 20)
    want = _torch_denoise_forward(params, np.asarray(x), np.array([0, 1, 2, 3]))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_bf16_param_storage_trains_stably(tiny_config, tiny_data):
    """base.denoise_param_dtype='bf16': params/grads/Adam moments ride bf16
    (half the phase-1/2 HBM state); the dtype must survive the scan carry
    (adam_update casts the applied update back) and losses stay finite."""
    import copy

    import numpy as np

    from diffmm_tpu.train.coach import Coach

    cfg = copy.deepcopy(tiny_config)
    cfg.base.denoise_param_dtype = "bf16"
    coach = Coach(cfg, tiny_data)
    assert coach.dn_params[0]["in_layers"][0]["w"].dtype == jnp.bfloat16
    r = coach.train_epoch(0)
    assert coach.dn_params[0]["in_layers"][0]["w"].dtype == jnp.bfloat16
    assert coach.dn_opt_states[0].mu["in_layers"][0]["w"].dtype == jnp.bfloat16
    assert all(np.isfinite(v) for v in r.values()), r


def test_bad_denoise_param_dtype_rejected(tiny_config, tiny_data):
    import copy

    import pytest

    from diffmm_tpu.train.coach import Coach

    cfg = copy.deepcopy(tiny_config)
    cfg.base.denoise_param_dtype = "fp8"
    with pytest.raises(ValueError, match="denoise_param_dtype"):
        Coach(cfg, tiny_data)
