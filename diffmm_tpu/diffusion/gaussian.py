"""Gaussian diffusion processes: q-sample, training loss, reverse generation.

Parity target: reference `Model.py:222-428` (class ``GaussianDiffusion``).
The denoiser is passed in functionally as ``(params, x_t, t, modal_feat) ->
x0_hat`` so the same code drives every modality.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from diffmm_tpu.diffusion.schedule import DiffusionSchedule, snr
from diffmm_tpu.models.denoise import denoise_forward
from diffmm_tpu.ops.losses import l2_normalize

DenoiseApply = Callable[..., jax.Array]


def _extract(buf: jax.Array, t: jax.Array) -> jax.Array:
    """Gather (steps,) schedule buffer at per-row timesteps -> (B, 1)."""
    return buf[t][:, None]


def q_sample(
    schedule: DiffusionSchedule,
    x0: jax.Array,
    t: jax.Array,
    noise: jax.Array | None,
    key: jax.Array | None = None,
) -> jax.Array:
    """Forward-noise x0 to x_t (reference `Model.py:324-341`).

    When ``noise is None`` the reference draws ``sign(x0) * row_l2_normalize(
    randn)`` — that branch is only reached from ``generate_view``
    (`Model.py:313-314`); training passes plain Gaussian noise
    (`Model.py:400-401`).
    """
    if noise is None:
        assert key is not None
        raw = jax.random.normal(key, x0.shape, dtype=x0.dtype)
        noise = jnp.sign(x0) * l2_normalize(raw, axis=1)
    x0_coef = _extract(schedule.sqrt_alphas_cumprod, t)
    noise_coef = _extract(schedule.sqrt_one_minus_alphas_cumprod, t)
    return x0_coef * x0 + noise_coef * noise


def training_losses(
    schedule: DiffusionSchedule,
    denoise_params,
    x_start: jax.Array,
    i_embs: jax.Array,
    modal_feat: jax.Array,
    key: jax.Array,
    sim_weight: float,
    reg: float,
    denoise_apply: DenoiseApply = denoise_forward,
) -> jax.Array:
    """Per-row diffusion training loss (reference `Model.py:385-428`).

    Three terms:
      * SNR-weighted MSE reconstruction: ``w_t * mean_items((x0_hat - x0)^2)``
        with ``w_t = SNR(t-1) - SNR(t)`` and ``w_0 = 1`` (`Model.py:407-413`).
      * preference similarity: ``1 - cos(x0_hat @ F, x0 @ E_i)``
        (`Model.py:416-418`), scaled by ``sim_weight``.
      * L2 regularization on item embeddings scaled by ``reg``; note the
        reference multiplies ``reg`` twice (once inside ``l2_reg_loss``, once
        at `Model.py:425`), giving an effective ``reg^2 * ||E_i||^2`` —
        reproduced faithfully.

    ``i_embs`` is treated as constant here: the reference lets gradients flow
    into it but zeroes them before the main-model step (`Main.py:375`), so the
    net effect is no update (SURVEY-verified); we stop the gradient outright.

    Returns the (B,) per-row loss.
    """
    batch = x_start.shape[0]
    t_key, n_key = jax.random.split(key)
    t = jax.random.randint(t_key, (batch,), 0, schedule.steps)
    noise = jax.random.normal(n_key, x_start.shape, dtype=x_start.dtype)
    x_t = q_sample(schedule, x_start, t, noise)

    x0_hat = denoise_apply(denoise_params, x_t, t, modal_feat)

    mse = jnp.mean(jnp.square(x0_hat - x_start), axis=-1)
    t_prev = jnp.maximum(t - 1, 0)
    weight = snr(schedule, t_prev) - snr(schedule, t)
    weight = jnp.where(t == 0, 1.0, weight)
    reconstruction = weight * mse

    i_embs = jax.lax.stop_gradient(i_embs)
    user_modal = x0_hat @ modal_feat  # (B, latdim)
    user_id = x_start @ i_embs  # (B, latdim)
    cos = jnp.sum(
        l2_normalize(user_modal, axis=-1) * l2_normalize(user_id, axis=-1), axis=-1
    )
    sim_loss = 1.0 - cos

    reg_loss = reg * jnp.sum(jnp.square(i_embs))  # l2_reg_loss with one table

    return reconstruction + sim_loss * sim_weight + reg_loss * reg


def p_mean(
    schedule: DiffusionSchedule,
    denoise_params,
    x_t: jax.Array,
    t: jax.Array,
    denoise_apply: DenoiseApply = denoise_forward,
) -> jax.Array:
    """Posterior mean of p(x_{t-1} | x_t) (reference `Model.py:357-378`).

    The denoiser runs WITHOUT modality conditioning here (`Model.py:365`), and
    the returned log-variance is never consumed by the deterministic reverse
    loop — so only the mean is computed.
    """
    x0_hat = denoise_apply(denoise_params, x_t, t, None)
    c1 = _extract(schedule.posterior_mean_coef1, t)
    c2 = _extract(schedule.posterior_mean_coef2, t)
    return c1 * x0_hat + c2 * x_t


def generate_view(
    schedule: DiffusionSchedule,
    denoise_params,
    x_start: jax.Array,
    sampling_step,
    key: jax.Array | None = None,
    denoise_apply: DenoiseApply = denoise_forward,
) -> jax.Array:
    """Deterministic reverse diffusion (reference `Model.py:300-322`).

    ``sampling_step == 0``: start from the clean row (no noise is ever added).
    Otherwise q-sample to ``t = sampling_step - 1`` with the sign-normalized
    noise, then run the full ``steps-1 .. 0`` posterior-mean loop (the loop
    always covers all steps regardless of ``sampling_step``, `Model.py:316`).

    ``sampling_step`` may be a Python int (only when called eagerly or with a
    static argument — the q-sample is compiled out when 0) or a traced scalar
    (the jitted epoch programs always pass a traced one, so sweeps change it
    without recompiling; the ``where`` select costs nothing next to the
    denoiser MLP calls).
    """
    batch = x_start.shape[0]
    if isinstance(sampling_step, int):
        if sampling_step == 0:
            x_t = x_start
        else:
            assert key is not None, "sampling_step > 0 requires an RNG key"
            t0 = jnp.full((batch,), sampling_step - 1, dtype=jnp.int32)
            x_t = q_sample(schedule, x_start, t0, noise=None, key=key)
    else:
        assert key is not None, "traced sampling_step requires an RNG key"
        s = jnp.asarray(sampling_step, dtype=jnp.int32)
        t0 = jnp.full((batch,), jnp.maximum(s - 1, 0), dtype=jnp.int32)
        noised = q_sample(schedule, x_start, t0, noise=None, key=key)
        x_t = jnp.where(s == 0, x_start, noised)

    def body(x, i):
        t = jnp.full((batch,), i, dtype=jnp.int32)
        return p_mean(schedule, denoise_params, x, t, denoise_apply), None

    steps = jnp.arange(schedule.steps - 1, -1, -1)
    x_t, _ = jax.lax.scan(body, x_t, steps)
    return x_t
