"""Gaussian diffusion processes vs torch ports of the reference
(reference `Model.py:300-428`)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffmm_tpu.diffusion.gaussian import (
    generate_view,
    p_mean,
    q_sample,
    training_losses,
)
from diffmm_tpu.diffusion.schedule import make_schedule
from diffmm_tpu.models.denoise import denoise_forward, init_denoise_params

SCHED = make_schedule(0.1, 0.0001, 0.02, 5)


def test_q_sample_known_noise(rng):
    x0 = rng.standard_normal((4, 10)).astype(np.float32)
    noise = rng.standard_normal((4, 10)).astype(np.float32)
    t = np.array([0, 1, 3, 4])
    got = np.asarray(
        q_sample(SCHED, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    )
    sa = np.asarray(SCHED.sqrt_alphas_cumprod)
    sm = np.asarray(SCHED.sqrt_one_minus_alphas_cumprod)
    want = sa[t][:, None] * x0 + sm[t][:, None] * noise
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_p_mean_formula(rng):
    """model_mean = c1(t) * x0_hat + c2(t) * x_t, denoiser unconditioned."""
    params = init_denoise_params(jax.random.PRNGKey(0), 10, [8], 10, 4)
    x_t = jnp.asarray(rng.standard_normal((3, 10)).astype(np.float32))
    t = jnp.array([2, 2, 2])
    got = np.asarray(p_mean(SCHED, params, x_t, t))
    x0_hat = np.asarray(denoise_forward(params, x_t, t, None))
    c1 = float(SCHED.posterior_mean_coef1[2])
    c2 = float(SCHED.posterior_mean_coef2[2])
    want = c1 * x0_hat + c2 * np.asarray(x_t)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_generate_view_step0_deterministic(rng):
    """sampling_step=0: no randomness at all — reverse from the clean row."""
    params = init_denoise_params(jax.random.PRNGKey(1), 12, [8], 10, 4)
    x0 = jnp.asarray((rng.random((5, 12)) < 0.3).astype(np.float32))
    a = generate_view(SCHED, params, x0, sampling_step=0)
    b = generate_view(SCHED, params, x0, sampling_step=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # manual unroll of the reverse loop
    x = x0
    for i in range(4, -1, -1):
        x = p_mean(SCHED, params, x, jnp.full((5,), i, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_generate_view_sampling_step_noises(rng):
    params = init_denoise_params(jax.random.PRNGKey(2), 12, [8], 10, 4)
    x0 = jnp.asarray((rng.random((5, 12)) < 0.3).astype(np.float32))
    a = generate_view(SCHED, params, x0, 2, key=jax.random.PRNGKey(3))
    b = generate_view(SCHED, params, x0, 2, key=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_generate_view_traced_step_matches_static(rng):
    """The dynamic (traced sampling_step) path == the static path, for 0 and
    for >0 with the same key."""
    params = init_denoise_params(jax.random.PRNGKey(2), 12, [8], 10, 4)
    x0 = jnp.asarray((rng.random((5, 12)) < 0.3).astype(np.float32))
    key = jax.random.PRNGKey(7)
    for s in (0, 2, 4):
        static = generate_view(SCHED, params, x0, s, key=key)
        traced = generate_view(SCHED, params, x0, jnp.int32(s), key=key)
        np.testing.assert_allclose(
            np.asarray(static), np.asarray(traced), rtol=1e-6, atol=1e-7
        )


def test_training_losses_terms(rng):
    """Check the three loss terms against a torch recomputation with the
    same x_t/t/noise (extracted by reproducing the jax RNG draws)."""
    item_num, latdim = 14, 6
    params = init_denoise_params(jax.random.PRNGKey(5), item_num, [8], 10, latdim)
    x0 = (rng.random((7, item_num)) < 0.4).astype(np.float32)
    i_embs = rng.standard_normal((item_num, latdim)).astype(np.float32)
    feat = rng.standard_normal((item_num, latdim)).astype(np.float32)
    key = jax.random.PRNGKey(9)
    sim_weight, reg = 0.3, 1e-3

    got = np.asarray(
        training_losses(
            SCHED, params, jnp.asarray(x0), jnp.asarray(i_embs), jnp.asarray(feat),
            key, sim_weight=sim_weight, reg=reg,
        )
    )

    # reproduce the internal draws
    t_key, n_key = jax.random.split(key)
    t = np.asarray(jax.random.randint(t_key, (7,), 0, SCHED.steps))
    noise = np.asarray(jax.random.normal(n_key, x0.shape, dtype=jnp.float32))
    sa = np.asarray(SCHED.sqrt_alphas_cumprod)
    sm = np.asarray(SCHED.sqrt_one_minus_alphas_cumprod)
    x_t = sa[t][:, None] * x0 + sm[t][:, None] * noise
    x0_hat = np.asarray(
        denoise_forward(params, jnp.asarray(x_t), jnp.asarray(t), jnp.asarray(feat))
    )

    ab = np.asarray(SCHED.alphas_cumprod, dtype=np.float64)
    snr = lambda s: ab[s] / (1 - ab[s] + 1e-8)
    w = snr(np.maximum(t - 1, 0)) - snr(t)
    w = np.where(t == 0, 1.0, w)
    mse = ((x0_hat - x0) ** 2).mean(axis=-1)

    um = torch.tensor(x0_hat) @ torch.tensor(feat)
    ui = torch.tensor(x0) @ torch.tensor(i_embs)
    sim = 1 - torch.cosine_similarity(um, ui, dim=-1)
    reg_term = reg * reg * float(np.sum(i_embs**2))

    want = w * mse + sim.numpy() * sim_weight + reg_term
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
