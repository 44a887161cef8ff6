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


def test_fused_mesh_matches_single_device(tiny_config, tiny_data):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    a, b = _pair(tiny_config, tiny_data, mesh=make_mesh(8, model_parallel=2))
    a.train_epochs_fused(0, 2)
    b.train_epochs_fused(0, 2)
    _assert_tree_close(a.gcn_params, b.gcn_params)


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


def test_chunk_size_respects_boundaries(tiny_config, tiny_data):
    cfg = copy.deepcopy(tiny_config)
    cfg.train.epoch_scan = 2
    cfg.train.tstEpoch = 2
    coach = Coach(cfg, tiny_data)
    # epoch 0 evaluates (0 % 2 == 0) -> no interior room -> single
    assert coach._chunk_size(0, 10) == 1
    # [1, 2]: interior epoch 1 is boundary-free, eval lands at chunk end
    assert coach._chunk_size(1, 10) == 2
    assert coach._chunk_size(3, 10) == 2
    # tail shorter than epoch_scan runs single-epoch (a 9-epoch tail chunk
    # measured a fresh 37 s scan-length compile on the tunnel)
    assert coach._chunk_size(9, 10) == 1
    # a shrunk (eval-misaligned) window never fuses either: epoch_scan=4
    # with tstEpoch=2 would make every chunk a distinct scan length
    cfg3 = copy.deepcopy(tiny_config)
    cfg3.train.epoch_scan = 4
    cfg3.train.tstEpoch = 2
    assert Coach(cfg3, tiny_data)._chunk_size(1, 10) == 1
    # epoch_scan=1 disables
    cfg2 = copy.deepcopy(tiny_config)
    cfg2.train.epoch_scan = 1
    assert Coach(cfg2, tiny_data)._chunk_size(1, 10) == 1


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
    # resume runs epoch 2 single (eval boundary), [3, 4] as one fused
    # chunk, epoch 5 single (tail) — spy that the fused path really ran
    fused_calls = []
    orig = second.train_epochs_fused
    second.train_epochs_fused = lambda e, n: (
        fused_calls.append((e, n)) or orig(e, n)
    )
    second.run(epochs=6)
    assert fused_calls == [(3, 2)], fused_calls

    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(full.key)),
        np.asarray(jax.random.key_data(second.key)),
    )
    _assert_tree_close(full.gcn_params, second.gcn_params)


def test_run_with_epoch_scan(tiny_config, tiny_data):
    """run() with fusion enabled matches the plain run's best metrics."""
    cfg = copy.deepcopy(tiny_config)
    cfg.train.tstEpoch = 2
    plain = Coach(copy.deepcopy(cfg), tiny_data).run(epochs=4)
    cfg.train.epoch_scan = 2
    fused = Coach(cfg, tiny_data).run(epochs=4)
    assert fused["best_epoch"] == plain["best_epoch"]
    assert abs(fused["Recall"] - plain["Recall"]) <= 0.05
