"""Failure detection (SURVEY.md §5.3 — absent in the reference): training
divergence must be caught at the epoch boundary and a checkpointed run must
be resumable from the last good epoch.

Divergence is injected deterministically by poisoning the learning rate with
NaN — the traced lr reaches every phase's Adam update, so the epoch's loss
accounting goes non-finite within that epoch."""

import numpy as np
import pytest

from diffmm_tpu.config import Config
from diffmm_tpu.data.synthetic import make_synthetic_host_data
from diffmm_tpu.train.coach import Coach

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box


@pytest.fixture()
def cfg_host():
    cfg = Config()
    cfg.base.seed = 3
    cfg.base.latdim = 16
    cfg.base.denoise_dim = "[32]"
    cfg.train.batch = 16
    cfg.train.test_batch = 32
    host = make_synthetic_host_data(cfg, user_num=40, item_num=30, seed=2)
    return cfg, host


def test_divergence_raises_and_resumes_from_last_good(cfg_host, tmp_path):
    cfg, host = cfg_host
    ckpt_dir = str(tmp_path / "ckpt")

    coach = Coach(cfg, host, checkpoint_dir=ckpt_dir, checkpoint_every=1)
    good = coach.run(epochs=2)  # saves epochs 0 and 1
    assert np.isfinite(good["Recall"])
    assert coach.ckpt.latest_epoch() == 1

    # poison the lr: epoch 2 trains with NaN updates and the guard fires at
    # the epoch boundary (coach.run resumes from its own checkpoint first)
    cfg.train.lr = float("nan")
    with pytest.raises(FloatingPointError, match="diverged at epoch 2"):
        coach.run(epochs=4)

    # the failed epoch must not have been checkpointed — last good is 1
    assert coach.ckpt.latest_epoch() == 1

    # recovery: restore the lr, fresh Coach, resume from the last good epoch
    cfg.train.lr = 0.001
    coach2 = Coach(cfg, host, checkpoint_dir=ckpt_dir, checkpoint_every=1)
    final = coach2.run(epochs=4)  # resumes at epoch 2, finishes 2 and 3
    assert np.isfinite(final["Recall"]) and np.isfinite(final["NDCG"])
    assert coach2.ckpt.latest_epoch() == 3


def test_divergence_without_checkpointing_still_raises(cfg_host):
    cfg, host = cfg_host
    cfg.train.lr = float("nan")
    coach = Coach(cfg, host)
    with pytest.raises(FloatingPointError, match="diverged at epoch 0"):
        coach.run(epochs=2)
