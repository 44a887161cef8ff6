"""Smoke tests for tools/plot_sweeps.py (figure parity with the
reference's sensitivity plots — no pixel assertions, just that every
sweep-JSON schema renders)."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "plot_sweeps", os.path.join(REPO, "tools", "plot_sweeps.py")
)
plot_sweeps = importlib.util.module_from_spec(spec)
spec.loader.exec_module(plot_sweeps)


def _write(tmp_path, name, doc):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def test_renders_all_three_schemas(tmp_path):
    simple = _write(tmp_path, "simple.json", {
        "param": "noise_degree",
        "results": [{"noise_degree": 0.5, "Recall": 0.1, "NDCG": 0.04},
                    {"noise_degree": 1.0, "Recall": 0.11, "NDCG": 0.045}],
    })
    forked = _write(tmp_path, "forked.json", {
        "param": "data.missing_modalities",
        "results": [{"data.missing_modalities": "zeros", "Recall": 0.12,
                     "NDCG": 0.05},
                    {"data.missing_modalities": "svd", "error": 1}],
    })
    plan = _write(tmp_path, "plan.json", {
        "legs": [{"param": "seed",
                  "results": [{"seed": 1, "Recall": 0.1, "NDCG": 0.04}]}],
    })
    out = str(tmp_path / "out.png")
    assert plot_sweeps.main([simple, forked, plan, "--out", out]) == 0
    assert os.path.getsize(out) > 0


def test_all_failed_runs_render_empty_panel(tmp_path):
    failed = _write(tmp_path, "failed.json", {
        "param": "hyper.steps",
        "results": [{"hyper.steps": 3, "error": 1}],
    })
    out = str(tmp_path / "out.png")
    assert plot_sweeps.main([failed, "--out", out]) == 0
