"""Checkpoint/resume: an interrupted run continued from disk must match an
uninterrupted run exactly (same RNG streams, same params, same metrics)."""

import copy

import jax
import numpy as np
import pytest

from diffmm_tpu.train.coach import Coach

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box


@pytest.fixture()
def cfg(tiny_config):
    return copy.deepcopy(tiny_config)


def _params_allclose(a, b):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_resume_matches_uninterrupted(cfg, tiny_data, tmp_path):
    # uninterrupted: 3 epochs
    full = Coach(copy.deepcopy(cfg), tiny_data)
    full.run(epochs=3)

    # interrupted: a 3-epoch run killed after epoch 1's checkpoint, then a
    # fresh Coach resumes. The kill must not shrink the training horizon —
    # the cosine LR anneals over the *target* epoch count (run(epochs=N)
    # sets total_epochs=N), so the interrupted segment is driven manually
    # with the same horizon the full run used.
    ck = str(tmp_path / "ckpt")
    first = Coach(copy.deepcopy(cfg), tiny_data, checkpoint_dir=ck)
    first.total_epochs = 3
    for epoch in range(2):
        first.train_epoch(epoch)
    first.save_checkpoint(1, {})
    first.ckpt.close()

    second = Coach(copy.deepcopy(cfg), tiny_data, checkpoint_dir=ck)
    best = second.run(epochs=3)  # resumes at epoch 2, runs one more epoch

    _params_allclose(full.gcn_params, second.gcn_params)
    for a, b in zip(full.dn_params, second.dn_params):
        _params_allclose(a, b)
    # rebuilt modality graphs identical (compare the checkpointed buffers)
    for a, b in zip(full.edge_buffers, second.edge_buffers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # (best-Recall vs final-eval comparison intentionally omitted: "best"
    # tracks the max over epochs, which need not equal the final epoch's
    # Recall; exact resume is already proven by the param/buffer asserts.)


def test_knn_ablation_checkpoint_roundtrip(cfg, tiny_data, tmp_path):
    """use_knn_adj runs have no diffusion edge buffers; save/restore must
    still round-trip and rebuild the (data-derived) KNN graphs."""
    c = copy.deepcopy(cfg)
    c.hyper.use_knn_adj = True
    ck = str(tmp_path / "knn_ck")
    first = Coach(c, tiny_data, checkpoint_dir=ck)
    first.run(epochs=1)
    metrics_before = first.test_epoch()
    first.ckpt.close()

    second = Coach(copy.deepcopy(c), tiny_data, checkpoint_dir=ck)
    assert second.restore_checkpoint() is not None
    assert second.modal_adjs is not None
    metrics_after = second.test_epoch()
    for k in metrics_before:
        assert metrics_before[k] == pytest.approx(metrics_after[k], abs=1e-6)


def test_eval_after_restore_without_training(cfg, tiny_data, tmp_path):
    """The rebuilt modality graphs are checkpointed, so a restored Coach can
    evaluate immediately (eval depends on them, reference Main.py:398-400)."""
    ck = str(tmp_path / "ckpt")
    first = Coach(copy.deepcopy(cfg), tiny_data, checkpoint_dir=ck)
    first.run(epochs=1)
    metrics_before = first.test_epoch()
    first.ckpt.close()

    second = Coach(copy.deepcopy(cfg), tiny_data, checkpoint_dir=ck)
    assert second.restore_checkpoint() is not None
    metrics_after = second.test_epoch()
    for k in metrics_before:
        assert metrics_before[k] == pytest.approx(metrics_after[k], abs=1e-6)


def test_mesh_checkpoint_roundtrip_preserves_shardings(cfg, tiny_data, tmp_path):
    """Save under a mesh, restore into a fresh mesh Coach: params must match
    exactly AND keep the catalog-axis placement (StandardRestore takes the
    shardings from the live template tree)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from diffmm_tpu.parallel import MODEL_AXIS, make_mesh

    mesh = make_mesh(8, model_parallel=2)
    ck = str(tmp_path / "mesh_ck")
    first = Coach(copy.deepcopy(cfg), tiny_data, mesh=mesh, checkpoint_dir=ck)
    first.run(epochs=2)
    first.ckpt.close()

    second = Coach(copy.deepcopy(cfg), tiny_data, mesh=mesh, checkpoint_dir=ck)
    second.restore_checkpoint()
    _params_allclose(first.gcn_params, second.gcn_params)
    for a, b in zip(first.dn_params, second.dn_params):
        _params_allclose(a, b)
    assert second.gcn_params["i_embs"].sharding.spec[0] == MODEL_AXIS
    assert (
        second.dn_params[0]["out_layers"][-1]["w"].sharding.spec[1] == MODEL_AXIS
    )
