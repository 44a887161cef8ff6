"""CLI surface: end-to-end main() on a synthetic dataset (CPU)."""

import numpy as np

from diffmm_tpu.cli import main
import pytest


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, capsys):
    conf = tmp_path / "synth.toml"
    conf.write_text(
        """
[base]
latdim = 8
seed = 3
denoise_dim = "[16]"

[data]
name = "synthetic:40x30"

[hyper]
steps = 5

[train]
batch = 16
test_batch = 8
epoch = 2
"""
    )
    idx_path = tmp_path / "index"
    rc = main(
        [
            "-c", str(conf),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--export-index", str(idx_path),
        ]
    )
    assert rc == 0
    assert (tmp_path / "ck" / "1").exists()  # checkpoint for epoch 1

    from diffmm_tpu.eval.serving import load_index, recommend
    import jax.numpy as jnp

    index = load_index(str(idx_path))
    ids, scores = recommend(index, jnp.arange(4, dtype=jnp.int32), 5)
    assert ids.shape == (4, 5)
    assert np.isfinite(np.asarray(scores)).all()


def test_cli_bad_config_exit_code(tmp_path):
    assert main(["-c", str(tmp_path / "missing.toml")]) == 1


@pytest.mark.slow
def test_cli_set_overrides(tmp_path):
    """--set applies config overrides (incl. the fused epoch scan path)."""
    conf = tmp_path / "synth.toml"
    conf.write_text(
        """
[base]
latdim = 8
seed = 3
denoise_dim = "[16]"

[data]
name = "synthetic:40x30"

[hyper]
steps = 5

[train]
batch = 16
test_batch = 8
epoch = 4
"""
    )
    rc = main(
        [
            "-c", str(conf),
            "--set", "train.epoch_scan=2",
            "--set", "train.tstEpoch=2",
            "--set", "noise_degree=0.4",  # bare key -> [hyper]
        ]
    )
    assert rc == 0


def test_cli_set_unknown_field(tmp_path):
    conf = tmp_path / "synth.toml"
    conf.write_text('[data]\nname = "synthetic:40x30"\n')
    import pytest

    with pytest.raises(SystemExit):
        main(["-c", str(conf), "--set", "train.no_such_field=1"])
