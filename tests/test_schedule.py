"""Diffusion schedule golden tests: buffers must match a float64 torch port of
the reference math (reference `Model.py:239-275`)."""

import numpy as np
import pytest
import torch

from diffmm_tpu.diffusion.schedule import make_schedule, snr


def _torch_reference_buffers(noise_scale, noise_min, noise_max, steps):
    """Direct torch port of reference get_betas + calculate_for_diffusion."""
    start = noise_scale * noise_min
    end = noise_scale * noise_max
    variance = np.linspace(start, end, steps, dtype=np.float64)
    alpha_bar = 1 - variance
    betas = [1 - alpha_bar[0]]
    for i in range(1, steps):
        betas.append(min(1 - alpha_bar[i] / alpha_bar[i - 1], 0.999))
    betas = torch.tensor(np.array(betas), dtype=torch.float64)
    betas[0] = 0.0001

    alphas = 1.0 - betas
    alphas_cumprod = torch.cumprod(alphas, dim=0)
    alphas_cumprod_prev = torch.cat([torch.tensor([1.0]), alphas_cumprod[:-1]])
    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    posterior_log_variance_clipped = torch.log(
        torch.cat([posterior_variance[1].unsqueeze(0), posterior_variance[1:]])
    )
    coef1 = betas * torch.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    coef2 = (1.0 - alphas_cumprod_prev) * torch.sqrt(alphas) / (1.0 - alphas_cumprod)
    return {
        "betas": betas,
        "alphas_cumprod": alphas_cumprod,
        "alphas_cumprod_prev": alphas_cumprod_prev,
        "sqrt_alphas_cumprod": torch.sqrt(alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": torch.sqrt(1.0 - alphas_cumprod),
        "posterior_variance": posterior_variance,
        "posterior_log_variance_clipped": posterior_log_variance_clipped,
        "posterior_mean_coef1": coef1,
        "posterior_mean_coef2": coef2,
    }


@pytest.mark.parametrize(
    "scale,steps",
    [(0.1, 5), (0.5, 5), (0.2, 5), (0.1, 40)],  # all shipped configs + long T
)
def test_schedule_matches_reference(scale, steps):
    sched = _torch_reference_buffers(scale, 0.0001, 0.02, steps)
    got = make_schedule(scale, 0.0001, 0.02, steps)
    for name, want in sched.items():
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            want.numpy().astype(np.float32),
            rtol=1e-6,
            atol=1e-7,
            err_msg=name,
        )


def test_snr_weights():
    got = make_schedule(0.1, 0.0001, 0.02, 5)
    ab = np.asarray(got.alphas_cumprod, dtype=np.float64)
    t = np.arange(5)
    want = ab[t] / (1 - ab[t] + 1e-8)
    np.testing.assert_allclose(np.asarray(snr(got, t)), want, rtol=1e-4)


def test_zero_noise_scale_rejected():
    with pytest.raises(ValueError):
        make_schedule(0.0, 0.0001, 0.02, 5)
