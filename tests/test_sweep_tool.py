"""Sweep harness (tools/sweep.py) — the script equivalent of the
reference's sensitivity experiments (`notebooks/visualization.ipynb` cells
1-2 and the commented-out driver at reference `Main.py:491-521`).
Training itself is covered by the e2e tests; here we cover the config
resolution and the guard rails."""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "sweep_tool", os.path.join(REPO, "tools", "sweep.py")
)
sweep_tool = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sweep_tool)

from diffmm_tpu.config import Config  # noqa: E402


def test_resolve_bare_defaults_to_hyper():
    cfg = Config()
    obj, key = sweep_tool._resolve(cfg, "noise_degree")
    assert obj is cfg.hyper and key == "noise_degree"


def test_resolve_qualified_sections():
    cfg = Config()
    assert sweep_tool._resolve(cfg, "base.latdim") == (cfg.base, "latdim")
    assert sweep_tool._resolve(cfg, "train.batch") == (cfg.train, "batch")
    assert sweep_tool._resolve(cfg, "data.missing_modalities") == (
        cfg.data, "missing_modalities"
    )


def test_resolve_unknown_field_exits():
    with pytest.raises(SystemExit):
        sweep_tool._resolve(Config(), "hyper.not_a_knob")


def test_cast_values_uses_field_type():
    cfg = Config()
    assert sweep_tool._cast_values(cfg, "hyper.steps", "3,5") == [3, 5]
    assert sweep_tool._cast_values(cfg, "noise_degree", "0.5,1.5") == [0.5, 1.5]
    assert sweep_tool._cast_values(cfg, "seed", "7,8") == [7, 8]


def test_structural_param_rejected_without_fork():
    """Sweeping a compile-time constant on a reused Coach would silently
    keep the old value — the tool must refuse before building anything."""
    with pytest.raises(SystemExit, match="compile-time"):
        sweep_tool.main(["--param", "steps", "--values", "3,5"])


def test_plan_rejects_structural_param():
    with pytest.raises(SystemExit, match="compile-time"):
        sweep_tool.main(["--plan", "steps=3,5"])


def test_resolve_bare_seed_maps_to_base():
    cfg = Config()
    assert sweep_tool._resolve(cfg, "seed") == (cfg.base, "seed")


def test_resolve_unknown_section_exits_cleanly():
    with pytest.raises(SystemExit, match="unknown config field"):
        sweep_tool._resolve(Config(), "trian.batch")


def test_bool_cast_parses_false():
    assert sweep_tool._cast(bool, "False") is False
    assert sweep_tool._cast(bool, "true") is True
    assert sweep_tool._cast(bool, "0") is False
    with pytest.raises(SystemExit):
        sweep_tool._cast(bool, "maybe")
    cfg = Config()
    assert sweep_tool._cast_values(cfg, "train.use_lr_scheduler", "True,False") \
        == [True, False]


def test_forked_plan_rejected():
    with pytest.raises(SystemExit, match="not supported"):
        sweep_tool.main(["--forked", "--plan", "steps=3,5"])


def test_qualified_dynamic_safe_params_accepted():
    assert "train.lr" in sweep_tool.DYNAMIC_SAFE
    cfg = Config()
    assert sweep_tool._cast_values(cfg, "train.lr", "0.001,0.002") == [0.001, 0.002]


def test_dynamic_safe_is_spelling_independent():
    cfg = Config()
    assert sweep_tool._is_dynamic_safe(cfg, "sim_weight")
    assert sweep_tool._is_dynamic_safe(cfg, "hyper.sim_weight")
    assert sweep_tool._is_dynamic_safe(cfg, "train.lr")
    assert sweep_tool._is_dynamic_safe(cfg, "seed")
    assert not sweep_tool._is_dynamic_safe(cfg, "steps")
    assert not sweep_tool._is_dynamic_safe(cfg, "hyper.noise_scale")


def test_sweep_one_reseeds_for_any_seed_spelling():
    """A QUALIFIED seed param ('base.seed') must reach reset(seed=value)
    like the bare 'seed' does. The old string match missed it, so every
    value trained on the stale seed — five bit-identical 300-epoch rows
    on the TPU before it was caught (round 5)."""

    class FakeCoach:
        def __init__(self):
            self.reset_seeds = []

        def reset(self, seed=None):
            self.reset_seeds.append(seed)

        def run(self, epochs):
            return {"Recall": 0.1}

    class FakeLog:
        def info(self, msg):
            pass

    cfg = Config()
    for spelling in ("seed", "base.seed"):
        coach = FakeCoach()
        rows = sweep_tool._sweep_one(
            coach, cfg, FakeLog(), spelling, [7, 8], epochs=1, fresh=False
        )
        assert coach.reset_seeds == [7, 8], spelling
        assert [r[spelling] for r in rows] == [7, 8]


def test_plan_accepts_qualified_dynamic_param():
    """Qualified spellings of dynamic-safe params must not be refused.
    Setting a bogus dataset name makes the host-data load fail right after
    the guard, so the sweep never actually trains."""
    with pytest.raises(Exception) as exc:
        sweep_tool.main(["-c", "conf/test.toml",
                         "--set", "data.name=no_such_dataset",
                         "--plan", "hyper.sim_weight=0.01"])
    assert "compile-time" not in str(exc.value)
