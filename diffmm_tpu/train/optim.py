"""Optimizers & LR schedule.

Parity target: one Adam(lr, weight_decay=0) + per-epoch CosineAnnealingLR
(T_max=total_epochs, eta_min=1e-4) per model — main model + one per modality
denoiser (reference `Main.py:92-110`, stepped per epoch at `Main.py:59-66`).

The learning rate is threaded into the jitted step as a scalar argument
(so epoch-level LR changes never retrace), with Adam moments handled by
``optax.scale_by_adam`` (same bias-corrected update as torch Adam with
betas=(0.9, 0.999), eps=1e-8).
"""

from __future__ import annotations

import math

import jax
import optax


def make_adam():
    """Adam transform without LR baked in (LR applied as a runtime scalar)."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def adam_update(tx, grads, opt_state, params, lr):
    # the .astype keeps sub-f32 param storage (base.denoise_param_dtype)
    # stable across scan iterations: lr is a strong f32 scalar, so `p - lr*u`
    # would silently promote bf16 params to f32 and break the carry dtype
    updates, new_state = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(
        lambda p, u: (p - lr * u).astype(p.dtype), params, updates
    )
    return new_params, new_state


def cosine_lr(epoch: int, base_lr: float, total_epochs: int, eta_min: float = 1e-4) -> float:
    """LR used during ``epoch``: torch CosineAnnealingLR stepped once per epoch
    (reference `Main.py:59-66,93`)."""
    if total_epochs <= 0:
        return base_lr
    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / total_epochs)) / 2
