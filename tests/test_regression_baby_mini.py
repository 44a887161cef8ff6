"""Real-data accuracy regression on the committed baby subsample.

``data/baby_mini`` is the first 2000 baby users against the full 7050-item
catalog (built with ``tools/dataset_tools.py subsample``; the reference mount
ships only the interaction pickles for baby — both feature blobs are
synthesized, svd mode, exactly like the full baby runs in this environment).
Four epochs with a small model must land Recall@20 in a pinned band: random
ranking is ~20/7050 ≈ 0.003, so the floor (~2x random) fails a no-op or
half-broken joint phase, while the ceiling flags silent eval inflation.
"""

import os

import pytest

from diffmm_tpu.config import Config
from diffmm_tpu.data.loader import load_host_data
from diffmm_tpu.train.coach import Coach

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MINI = os.path.join(REPO, "data", "baby_mini")


@pytest.mark.skipif(not os.path.isdir(MINI), reason="baby_mini slice not present")
def test_baby_mini_four_epoch_recall_band():
    cfg = Config()
    cfg.data.name = "baby_mini"
    cfg.data.missing_modalities = "svd"
    cfg.base.seed = 1818
    cfg.base.latdim = 32
    cfg.base.denoise_dim = "[64]"
    cfg.train.batch = 512
    cfg.train.test_batch = 512
    cfg.train.epoch = 4

    host = load_host_data(cfg, data_root=os.path.join(REPO, "data"))
    assert host.user_num == 2000 and host.item_num == 7050
    assert host.synthesized == ["image", "text"]
    coach = Coach(cfg, host)
    for epoch in range(4):
        coach.train_epoch(epoch)
    result = coach.test_epoch()
    # measured 0.011821 (bit-identical across consecutive CPU runs,
    # 2026-08-17); band is ±~50% of the measurement
    assert 0.006 <= result["Recall"] <= 0.018, result
