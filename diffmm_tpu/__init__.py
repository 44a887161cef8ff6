"""diffmm_tpu: a TPU-native JAX framework for multi-modal graph-diffusion
recommendation, with the full capability surface of the DiffMM reference
implementation (see SURVEY.md / COMPONENTS.md).

Public API (lazy — importing the package does not pull in jax):

    from diffmm_tpu import load_config, load_host_data, Coach, make_mesh
    cfg = load_config("conf/tiktok.toml")
    host = load_host_data(cfg)
    coach = Coach(cfg, host)            # optionally mesh=make_mesh(8, 2)
    coach.run()                          # or per-epoch train_epoch/test_epoch

Serving:

    from diffmm_tpu.eval.serving import build_index, recommend
    ids, scores = recommend(build_index(coach), user_ids, k=20)
"""

__version__ = "0.1.0"

_LAZY = {
    "load_config": ("diffmm_tpu.config", "load_config"),
    "Config": ("diffmm_tpu.config", "Config"),
    "load_host_data": ("diffmm_tpu.data.loader", "load_host_data"),
    "Coach": ("diffmm_tpu.train.coach", "Coach"),
    "make_mesh": ("diffmm_tpu.parallel.mesh", "make_mesh"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'diffmm_tpu' has no attribute {name!r}")


__all__ = ["__version__", *_LAZY]
