"""Accuracy-at-scale regression (VERDICT r4 #7): a sports-shaped
(35,598 x 18,357) STRUCTURED synthetic trained for one epoch on the sparse
form must clear a pinned Recall floor. Real sports/yelp data is not shipped
in this environment, so this is the standing guard that the sparse
production path (CSR membership store + MXU segsum plans + rebuilt modality
graphs) LEARNS at scale — a layout/plan bug that silently zeroed or
misrouted edges would crater Recall long before it tripped a loss check.

Band calibration (CPU, seed 5, batch 4096): epoch-0 Recall@20 = 0.28–0.29
across the batch-1024 and batch-4096 block layouts (three further epochs
move it 0.282 -> 0.288, so one epoch is already representative). The
random-ranking baseline is 20/18357 = 0.0011; the floor is set at 0.15 —
half the calibrated value, 140x random — so seed-level drift never flakes
while any structural regression (which lands near random) fails loudly.
"""

import copy

import pytest

from diffmm_tpu.config import Config
from diffmm_tpu.data.synthetic import make_synthetic_host_data
from diffmm_tpu.train.coach import Coach

SPORTS_USERS, SPORTS_ITEMS = 35_598, 18_357
SPORTS_DENSITY = 256_308 / (SPORTS_USERS * SPORTS_ITEMS)


@pytest.mark.slow
def test_sports_shape_structured_recall_floor():
    cfg = Config()
    cfg.base.seed = 5
    cfg.base.latdim = 16
    cfg.base.denoise_dim = "[32]"
    cfg.hyper.steps = 5
    cfg.train.batch = 4096
    cfg.train.test_batch = 512
    cfg.train.epoch = 1
    cfg.train.graph_form = "sparse"
    host = make_synthetic_host_data(
        cfg,
        user_num=SPORTS_USERS,
        item_num=SPORTS_ITEMS,
        density=SPORTS_DENSITY,
        structure_rank=8,
        seed=5,
        modalities=["image", "text"],
        feat_dims=[32, 32],
    )
    assert host._train_dense is None  # large structured mode stays O(nnz)
    coach = Coach(cfg, host)
    assert coach.train_store_form == "csr"
    coach.train_epoch(0)
    result = coach.test_epoch()
    assert result["Recall"] > 0.15, result
    assert result["NDCG"] > 0.07, result
