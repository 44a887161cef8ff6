"""Device mesh construction for SPMD execution.

The reference is strictly single-process/single-GPU (reference `Main.py:22`,
`DataHandler.py:16`; SURVEY.md §2 "Parallelism: none"). Scaling here is
TPU-native: a `jax.sharding.Mesh` with two logical axes —

  * ``data``  — batch-dimension data parallelism: interaction triples,
    diffusion user rows, and eval user blocks are split across devices; the
    loss is a global mean, so XLA inserts the gradient ``psum`` over this
    axis automatically (single-controller JAX, collectives over ICI).
  * ``model`` — catalog-dimension model parallelism: the item axis of the
    denoiser's wide layers, the dense train matrix, and the full-catalog
    score matrix (SURVEY.md §2.3 — the analogue of "sequence parallelism"
    for this workload, where ``item_num`` is the scaling dimension).

Meshes are honest about hardware: within one host/slice, both axes ride ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    Args:
      n_devices: total devices to use (default: all available).
      model_parallel: size of the ``model`` axis; must divide ``n_devices``.
      devices: explicit device list (overrides ``n_devices``).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} available"
                )
            devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} must divide {n} devices")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    """1x1 mesh — lets the sharded code path run unchanged on one chip."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))
