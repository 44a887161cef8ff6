"""train.donate_buffers: state buffers are donated to their update programs.

The epoch programs consume-and-replace the training state (params + Adam
moments; the fused chunk also its edge-buffer carry). Donating those inputs
lets XLA alias them to the matching outputs, so the state's peak footprint
at a dispatch is one copy instead of input+output — the difference between
three and six per-catalog-row copies (params, m, v) at web scale. The
reference has no analogue (torch mutates parameters in place; reference
`Main.py:155-190,291-377` — in-place mutation is exactly what donation
recovers under JAX's functional updates).

Contract tested here:
  * donation changes NOTHING about the math — trajectories are identical
    with the knob on and off;
  * with donation on, the consumed buffers really are invalidated (i.e. the
    aliasing is real, not silently dropped);
  * with donation off, inputs survive (the round-2 behavior);
  * the fused chunk donates its whole state carry, including edge buffers.
"""

import copy

import jax
import numpy as np

from diffmm_tpu.train.coach import Coach
import pytest

pytestmark = pytest.mark.slow  # every test here (or its shared fixture) takes >10s on a stock CPU box


def _tree_allclose(ta, tb, rtol=1e-6, atol=1e-7):
    for (path, x), y in zip(
        jax.tree_util.tree_leaves_with_path(ta), jax.tree.leaves(tb)
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def test_donation_is_a_pure_memory_knob(tiny_config, tiny_data):
    """Same trajectory with donation on (default) and off."""
    cfg_on = copy.deepcopy(tiny_config)
    cfg_off = copy.deepcopy(tiny_config)
    cfg_off.train.donate_buffers = False
    a = Coach(cfg_on, tiny_data)
    b = Coach(cfg_off, tiny_data)
    res_a = [a.train_epoch(e) for e in range(2)]
    res_b = [b.train_epoch(e) for e in range(2)]
    for ra, rb in zip(res_a, res_b):
        for k in ra:
            assert abs(float(ra[k]) - float(rb[k])) <= 1e-5 * max(
                1.0, abs(float(ra[k]))
            ), (k, ra[k], rb[k])
    _tree_allclose(a.gcn_params, b.gcn_params)
    _tree_allclose(a.dn_params, b.dn_params)


def test_donation_invalidates_consumed_state(tiny_config, tiny_data):
    """The aliasing is real: the pre-epoch state buffers are deleted after
    the epoch's programs consumed them (CPU supports donation on this JAX,
    so the test exercises the same code path the TPU runs)."""
    coach = Coach(copy.deepcopy(tiny_config), tiny_data)
    assert coach.config.train.donate_buffers  # default on
    coach.train_epoch(0)  # pay compiles; capture steady-state refs below
    old_gcn = coach.gcn_params["u_embs"]
    old_dn = jax.tree.leaves(coach.dn_params)[0]
    old_opt = jax.tree.leaves(coach.gcn_opt_state)[0]
    coach.train_epoch(1)
    assert old_gcn.is_deleted()
    assert old_dn.is_deleted()
    assert old_opt.is_deleted()
    # the replacements are live and usable
    coach.test_epoch()


def test_donation_off_preserves_inputs(tiny_config, tiny_data):
    cfg = copy.deepcopy(tiny_config)
    cfg.train.donate_buffers = False
    coach = Coach(cfg, tiny_data)
    coach.train_epoch(0)
    old_gcn = coach.gcn_params["u_embs"]
    old_dn = jax.tree.leaves(coach.dn_params)[0]
    coach.train_epoch(1)
    assert not old_gcn.is_deleted()
    assert not old_dn.is_deleted()
    np.asarray(old_gcn)  # still readable


def test_async_save_then_donating_epoch(tiny_config, tiny_data, tmp_path):
    """The async-checkpoint / donation interplay: orbax's save snapshots
    device arrays to host BEFORE returning (writing continues in the
    background), so an immediately-following epoch may donate — and
    therefore invalidate — the very buffers just saved. The restored
    checkpoint must hold the pre-donation values."""
    cfg = copy.deepcopy(tiny_config)
    coach = Coach(cfg, tiny_data, checkpoint_dir=str(tmp_path / "ck"))
    assert coach.ckpt.async_save
    coach.train_epoch(0)
    saved_u = np.asarray(coach.gcn_params["u_embs"])
    saved_dn = np.asarray(jax.tree.leaves(coach.dn_params)[0])
    coach.save_checkpoint(0, {"Recall": 0.0})
    coach.train_epoch(1)  # donates (deletes) the buffers the save references
    coach.ckpt.wait()

    fresh = Coach(
        copy.deepcopy(cfg), tiny_data, checkpoint_dir=str(tmp_path / "ck")
    )
    assert fresh.restore_checkpoint() is not None
    np.testing.assert_array_equal(
        np.asarray(fresh.gcn_params["u_embs"]), saved_u
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(fresh.dn_params)[0]), saved_dn
    )


def test_donation_effective_under_mesh(tiny_config, tiny_data):
    """Donation must survive NamedSharding placement — a sharding mismatch
    between a donated input and its output makes XLA fall back to a copy
    (silently, with only a warning), which would quietly forfeit the memory
    saving exactly where it matters most (the model-sharded catalog-wide
    params). Assert the old buffers really die on a (4, 2) mesh, including
    the model-axis-sharded i_embs."""
    from diffmm_tpu.parallel import make_mesh

    coach = Coach(
        copy.deepcopy(tiny_config), tiny_data,
        mesh=make_mesh(8, model_parallel=2),
    )
    coach.train_epoch(0)
    old_u = coach.gcn_params["u_embs"]
    old_i = coach.gcn_params["i_embs"]  # rides the model axis
    old_dn = jax.tree.leaves(coach.dn_params)[0]
    coach.train_epoch(1)
    assert old_u.is_deleted()
    assert old_i.is_deleted()
    assert old_dn.is_deleted()


def test_fused_chunk_donates_state_carry(tiny_config, tiny_data):
    """The fused program donates params, moments, AND the edge-buffer carry;
    trajectory still matches a donation-off fused run."""
    cfg_on = copy.deepcopy(tiny_config)
    cfg_on.train.epoch_scan = 2
    cfg_off = copy.deepcopy(cfg_on)
    cfg_off.train.donate_buffers = False
    a = Coach(cfg_on, tiny_data)
    b = Coach(cfg_off, tiny_data)
    a.total_epochs = b.total_epochs = 4

    a.train_epochs_fused(0, 2)  # first chunk: edge_buffers was the zero init
    old_gcn = a.gcn_params["u_embs"]
    old_buf = a.edge_buffers[0]
    res_a = a.train_epochs_fused(2, 2)
    assert old_gcn.is_deleted()
    assert old_buf.is_deleted()

    b.train_epochs_fused(0, 2)
    res_b = b.train_epochs_fused(2, 2)
    for ra, rb in zip(res_a, res_b):
        for k in ra:
            assert abs(float(ra[k]) - float(rb[k])) <= 1e-5 * max(
                1.0, abs(float(ra[k]))
            ), (k, ra[k], rb[k])
    _tree_allclose(a.gcn_params, b.gcn_params)


def test_failed_donating_dispatch_marks_state_invalid(tiny_config, tiny_data):
    """If a donating dispatch raises midway (OOM/interrupt), Coach state may
    reference already-deleted buffers; subsequent use must fail with an
    actionable RuntimeError — not a confusing deleted-buffer error — and
    reset()/restore must clear the condition (ADVICE r3)."""
    import pytest

    coach = Coach(copy.deepcopy(tiny_config), tiny_data)
    coach.train_epoch(0)

    boom = RuntimeError("simulated device OOM")

    def failing_joint_epoch(*a, **k):
        raise boom

    orig_steps = coach.steps
    coach.steps = coach.steps._replace(joint_epoch=failing_joint_epoch)
    with pytest.raises(RuntimeError, match="simulated device OOM"):
        coach.train_epoch(1)
    coach.steps = orig_steps

    for call in (
        lambda: coach.train_epoch(2),
        lambda: coach.test_epoch(),
        lambda: coach.train_epochs_fused(2, 2),
    ):
        with pytest.raises(RuntimeError, match="donate"):
            call()

    coach.reset()
    coach.train_epoch(0)  # fully usable again after reset
    coach.test_epoch()


def test_failed_dispatch_without_donation_stays_usable(tiny_config, tiny_data):
    """With donate_buffers=false a failed dispatch loses nothing — the guard
    must NOT mark state invalid."""
    import pytest

    cfg = copy.deepcopy(tiny_config)
    cfg.train.donate_buffers = False
    coach = Coach(cfg, tiny_data)
    coach.train_epoch(0)

    orig_steps = coach.steps
    coach.steps = coach.steps._replace(
        joint_epoch=lambda *a, **k: (_ for _ in ()).throw(RuntimeError("x"))
    )
    with pytest.raises(RuntimeError):
        coach.train_epoch(1)
    coach.steps = orig_steps

    coach.train_epoch(1)  # state was never donated; training continues
    coach.test_epoch()
