"""train.epoch_scan: E epochs fused into one compiled program.

Parity contract (coach.train_epochs_fused / steps.make_epochs_fused): the
fused path consumes the RNG key stream and the numpy permutation stream
EXACTLY as E train_epoch calls would — asserted bit-for-bit here, which
makes checkpoints interchangeable between the two paths — and produces the
same training trajectory up to cross-program float reassociation noise.
"""

import copy

import jax
import numpy as np
import pytest

from diffmm_tpu.parallel import make_mesh
from diffmm_tpu.train.coach import Coach


def _assert_tree_close(ta, tb, rtol=2e-3, atol=1e-5):
    flat_a = jax.tree_util.tree_leaves_with_path(ta)
    flat_b = jax.tree.leaves(tb)
    assert len(flat_a) == len(flat_b), (len(flat_a), len(flat_b))
    for (path, x), y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def _pair(tiny_config, tiny_data, mesh=None):
    a = Coach(copy.deepcopy(tiny_config), tiny_data)
    b = Coach(copy.deepcopy(tiny_config), tiny_data, mesh=mesh)
    a.total_epochs = b.total_epochs = 4
    return a, b


@pytest.mark.slow
def test_fused_matches_single_epoch_path(tiny_config, tiny_data):
    a, b = _pair(tiny_config, tiny_data)
    res_a = [a.train_epoch(e) for e in range(4)]
    res_b = b.train_epochs_fused(0, 4)

    # RNG streams advance identically — exact, not approximate
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(a.key)),
        np.asarray(jax.random.key_data(b.key)),
    )
    assert a.np_rng.bit_generator.state == b.np_rng.bit_generator.state

    # per-epoch loss accounting agrees to reduction-order noise
    for ra, rb in zip(res_a, res_b):
        assert ra.keys() == rb.keys()
        for k in ra:
            assert abs(float(ra[k]) - float(rb[k])) <= 1e-3 * max(
                1.0, abs(float(ra[k]))
            ), (k, ra[k], rb[k])

    # final model state agrees
    _assert_tree_close(a.gcn_params, b.gcn_params)

    # rebuilt edge buffers are integer tables; ULP-level score differences
    # between the two compiled programs can flip near-ties only
    agree = np.mean([
        np.mean(np.asarray(x) == np.asarray(y))
        for x, y in zip(a.edge_buffers, b.edge_buffers)
    ])
    assert agree > 0.99, agree

    # eval built from the fused path's rebuilt graphs works and agrees
    ea, eb = a.test_epoch(), b.test_epoch()
    assert abs(ea["Recall"] - eb["Recall"]) <= 0.05


@pytest.mark.slow
def test_fused_mesh_matches_single_device(tiny_config, tiny_data):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    a, b = _pair(tiny_config, tiny_data, mesh=make_mesh(8, model_parallel=2))
    a.train_epochs_fused(0, 2)
    b.train_epochs_fused(0, 2)
    _assert_tree_close(a.gcn_params, b.gcn_params)


@pytest.mark.slow
def test_fused_sparse_form(tiny_config, tiny_data):
    """The fused scan is graph-form agnostic: segment-sum SpMM path too."""
    cfg = copy.deepcopy(tiny_config)
    cfg.train.graph_form = "sparse"
    a = Coach(copy.deepcopy(cfg), tiny_data)
    b = Coach(copy.deepcopy(cfg), tiny_data)
    a.total_epochs = b.total_epochs = 2
    for e in range(2):
        a.train_epoch(e)
    b.train_epochs_fused(0, 2)
    _assert_tree_close(a.gcn_params, b.gcn_params)


def test_chunk_size_respects_boundaries(tiny_config, tiny_data, tmp_path):
    cfg = copy.deepcopy(tiny_config)
    cfg.train.epoch_scan = 3
    cfg.train.tstEpoch = 1  # eval boundaries do NOT break chunks (in-program)
    coach = Coach(cfg, tiny_data)
    assert coach._chunk_size(0, 10) == 3
    assert coach._chunk_size(3, 10) == 3
    # tail shorter than epoch_scan runs single-epoch (a 9-epoch tail chunk
    # measured a fresh 37 s scan-length compile on the tunnel)
    assert coach._chunk_size(9, 10) == 1
    assert coach._chunk_size(8, 10) == 1
    # checkpoint boundaries DO break chunks (the save is host-side)
    ck = Coach(
        copy.deepcopy(cfg), tiny_data,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=4,
    )
    # interior epoch 3 would checkpoint ((3+1) % 4 == 0) -> single
    assert ck._chunk_size(2, 10) == 1
    assert ck._chunk_size(4, 10) == 3
    # epoch_scan=1 disables
    cfg2 = copy.deepcopy(tiny_config)
    cfg2.train.epoch_scan = 1
    assert Coach(cfg2, tiny_data)._chunk_size(1, 10) == 1


@pytest.mark.slow
def test_run_fused_eval_mesh(tiny_config, tiny_data):
    """In-program eval under a mesh: the distributed-top-k shard_map runs
    inside lax.cond inside the epoch scan."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = copy.deepcopy(tiny_config)
    cfg.train.epoch_scan = 2
    meshed = Coach(
        copy.deepcopy(cfg), tiny_data, mesh=make_mesh(8, model_parallel=2)
    )
    single = Coach(copy.deepcopy(cfg), tiny_data)
    bm = meshed.run(epochs=2)
    bs = single.run(epochs=2)
    assert abs(bm["Recall"] - bs["Recall"]) <= 0.05
    assert bm["best_epoch"] == bs["best_epoch"]


@pytest.mark.slow
def test_fused_checkpoint_resume_interchangeable(tiny_config, tiny_data, tmp_path):
    """A single-epoch-path checkpoint resumes into a FUSED run exactly:
    the two paths consume identical RNG streams, so state is portable."""
    cfg = copy.deepcopy(tiny_config)
    cfg.train.tstEpoch = 2

    full = Coach(copy.deepcopy(cfg), tiny_data)
    full.run(epochs=6)  # epoch_scan=1: all single-epoch

    ck = str(tmp_path / "ckpt")
    first = Coach(copy.deepcopy(cfg), tiny_data, checkpoint_dir=ck)
    first.total_epochs = 6
    for epoch in range(2):
        first.train_epoch(epoch)
    first.save_checkpoint(1, {})
    first.ckpt.close()

    cfg.train.epoch_scan = 2
    second = Coach(cfg, tiny_data, checkpoint_dir=ck)
    # resume runs [2, 3] and [4, 5] as fused chunks (in-program evals at
    # 2 and 4) — spy that the fused path really ran
    fused_calls = []
    orig = second.train_epochs_fused
    second.train_epochs_fused = lambda e, n, s=None: (
        fused_calls.append((e, n)) or orig(e, n, s)
    )
    second.run(epochs=6)
    assert fused_calls == [(2, 2), (4, 2)], fused_calls

    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(full.key)),
        np.asarray(jax.random.key_data(second.key)),
    )
    _assert_tree_close(full.gcn_params, second.gcn_params)


@pytest.mark.slow
def test_run_fused_eval_every_epoch(tiny_config, tiny_data):
    """tstEpoch=1 (the reference cadence): evals run in-program under
    lax.cond, and the carry's best-state tracking reproduces the
    single-epoch path's best-model selection (reference Main.py:71-78)."""
    cfg = copy.deepcopy(tiny_config)  # tstEpoch = 1
    plain = Coach(copy.deepcopy(cfg), tiny_data)
    plain_best = plain.run(epochs=4)
    cfg.train.epoch_scan = 4
    fused = Coach(cfg, tiny_data)
    fused_best = fused.run(epochs=4)
    assert fused_best["best_epoch"] == plain_best["best_epoch"]
    assert abs(fused_best["Recall"] - plain_best["Recall"]) <= 0.05
    # the in-carry best snapshot equals the host-side capture of the same
    # epoch — the serving export reproduces the best epoch either way
    assert fused.best_snapshot is not None
    assert fused.best_snapshot["epoch"] == plain.best_snapshot["epoch"]
    _assert_tree_close(
        plain.best_snapshot["gcn_params"], fused.best_snapshot["gcn_params"]
    )
    for a, b in zip(
        plain.best_snapshot["edge_buffers"], fused.best_snapshot["edge_buffers"]
    ):
        assert np.mean(np.asarray(a) == np.asarray(b)) > 0.99


@pytest.mark.slow
def test_run_with_epoch_scan(tiny_config, tiny_data):
    """run() with fusion enabled matches the plain run's best metrics."""
    cfg = copy.deepcopy(tiny_config)
    cfg.train.tstEpoch = 2
    plain = Coach(copy.deepcopy(cfg), tiny_data).run(epochs=4)
    cfg.train.epoch_scan = 2
    fused = Coach(cfg, tiny_data).run(epochs=4)
    assert fused["best_epoch"] == plain["best_epoch"]
    assert abs(fused["Recall"] - plain["Recall"]) <= 0.05
