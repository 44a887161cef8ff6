"""SPMD parallelism: device meshes + sharding layout (SURVEY.md §2.3).

The reference has no distributed support at all (single process, single GPU,
``num_workers=0`` loaders — SURVEY.md §2). This package is the TPU-native
communication layer: `jax.sharding.Mesh` + input placement, with XLA
collectives (psum/all_gather/reduce_scatter) over ICI doing the actual
communication inside the unchanged jitted step functions.
"""

from diffmm_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    single_device_mesh,
)
from diffmm_tpu.parallel.sharding import (
    catalog_sharded,
    check_batch_divisibility,
    data_sharded,
    denoise_param_shardings,
    gcn_param_shardings,
    replicate,
    replicated,
    shard_batch,
    shard_device_data,
    shard_model_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "single_device_mesh",
    "catalog_sharded",
    "check_batch_divisibility",
    "data_sharded",
    "denoise_param_shardings",
    "gcn_param_shardings",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_device_data",
    "shard_model_params",
]
