"""tools/serve_bench.py: the closed-loop HTTP latency bench runs end-to-end.

Backs README's serving p50/p99 numbers (no reference counterpart — the
reference never serves a model, SURVEY.md §5.4). Exercises the
synthetic-index mode on a tiny shape: the tool spawns the real
`diffmm_tpu.eval.serve_http` server process, drives warmed traffic, and
reports percentile latency + throughput as one JSON line.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_serve_bench_synthetic_smoke():
    # CPU-forced env for tool AND the server it spawns: a bare interpreter
    # grabs the ambient TPU tunnel at start and would contend with any
    # live TPU job
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON_", "JAX_", "XLA_"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "serve_bench.py"),
            "synthetic:60,40,8",
            "--requests", "30",
            "--clients", "2",
            "--k", "5",
            "--port", "18412",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert (report["users"], report["items"]) == (60, 40)
    assert report["requests"] == 30
    assert report["p99_ms"] >= report["p50_ms"] > 0
    assert report["throughput_rps"] > 0
