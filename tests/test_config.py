"""Config loading: all six shipped reference tomls must load with one schema
(the reference itself rejects three of them — SURVEY.md §2.2)."""

import glob
import os

import pytest

from diffmm_tpu.config import Config, config_from_dict, load_config

REF_CONF = "/root/reference/conf"


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.base.latdim == 64
    assert cfg.base.topk == 20
    assert cfg.base.denoise_dims() == [1024]
    assert cfg.hyper.steps == 5
    assert cfg.train.batch == 1024
    assert cfg.train.reg == 1e-5


@pytest.mark.skipif(not os.path.isdir(REF_CONF), reason="reference not mounted")
@pytest.mark.parametrize(
    "name", ["test", "tiktok", "sports", "yelp", "baby", "ifashion"]
)
def test_all_shipped_tomls_load(name):
    cfg = load_config(os.path.join(REF_CONF, f"{name}.toml"))
    assert cfg.data.name in {"tiktok", "sports", "yelp", "baby", "ifashion"}
    assert cfg.base.denoise_dims() == [1024]
    assert cfg.hyper.steps == 5


@pytest.mark.skipif(not os.path.isdir(REF_CONF), reason="reference not mounted")
def test_legacy_aliases_mapped():
    cfg = load_config(os.path.join(REF_CONF, "baby.toml"))
    # sampling_steps (legacy) -> sampling_step; e_loss -> sim_weight
    assert cfg.hyper.sampling_step == 5
    assert cfg.hyper.sim_weight == 0.01


def test_strict_mode_rejects_unknown():
    with pytest.raises(ValueError):
        config_from_dict({"base": {"bogus_key": 1}}, strict=True)


def test_denoise_dim_list_form():
    cfg = config_from_dict({"base": {"denoise_dim": "[512, 256]"}})
    assert cfg.base.denoise_dims() == [512, 256]
