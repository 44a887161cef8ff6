"""Every shipped config loads (strict) and trains one epoch end-to-end on a
synthetic dataset with that config's hyperparameters."""

import copy
import glob
import os

import numpy as np
import pytest

from diffmm_tpu.config import load_config
from diffmm_tpu.data.synthetic import make_synthetic_host_data
from diffmm_tpu.train.coach import Coach

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box

CONFS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "conf", "*.toml")))


@pytest.mark.parametrize("path", CONFS, ids=[os.path.basename(p) for p in CONFS])
def test_config_loads_strict(path):
    cfg = load_config(path, strict=True)
    assert cfg.train.epoch > 0
    assert cfg.base.denoise_dims()


@pytest.mark.parametrize(
    "path", CONFS, ids=[os.path.basename(p) for p in CONFS]
)
def test_config_trains_one_epoch(path):
    cfg = load_config(path, strict=True)
    cfg.base.latdim = 8
    cfg.base.denoise_dim = "[16]"
    cfg.train.batch = 16
    cfg.train.test_batch = 8
    host = make_synthetic_host_data(
        cfg, user_num=40, item_num=30, seed=1,
        modalities=["image", "text"], feat_dims=[12, 10],
    )
    coach = Coach(cfg, host)
    res = coach.train_epoch(0)
    assert all(np.isfinite(v) for v in res.values()), res
    metrics = coach.test_epoch()
    assert 0.0 <= metrics["Recall"] <= 1.0
