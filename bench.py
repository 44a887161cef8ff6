"""Benchmark: tiktok training epoch throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "epochs/hr", "vs_baseline": N}

``value`` is steady-state epochs/hr on tiktok (median of the timed epochs,
first compile epoch excluded). ``vs_baseline`` is the speedup over the
unmodified PyTorch reference running on this machine's CPU, measured once by
``tools/bench_reference.py`` into ``bench_baseline.json`` (the north-star in
BASELINE.json is >=20x that reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
# Measured by tools/bench_reference.py on this machine (median epoch seconds
# of the torch-CPU reference on tiktok); overridden by bench_baseline.json.
FALLBACK_REF_EPOCH_S = None


def main() -> int:
    # first epoch is compile; median of the remaining steady epochs smooths
    # the tunnel's per-dispatch latency variance (observed ~±15%)
    epochs = int(os.environ.get("BENCH_EPOCHS", "6"))

    from diffmm_tpu.config import load_config
    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.train.coach import Coach
    from diffmm_tpu.utils.logging import Log

    config = load_config(os.path.join(REPO, "conf", "test.toml"))
    host = load_host_data(config)
    log = Log("bench", config.data.name)
    coach = Coach(config, host, log=log)

    times = []
    for ep in range(epochs):
        t0 = time.perf_counter()
        coach.train_epoch(ep)
        import jax

        jax.block_until_ready(coach.gcn_params["u_embs"])
        times.append(time.perf_counter() - t0)
        print(f"epoch {ep}: {times[-1]:.2f}s", file=sys.stderr, flush=True)
    coach.test_epoch()

    steady = sorted(times[1:]) if len(times) > 1 else times
    epoch_s = steady[len(steady) // 2]
    epochs_per_hr = 3600.0 / epoch_s

    baseline_path = os.path.join(REPO, "bench_baseline.json")
    ref_epoch_s = FALLBACK_REF_EPOCH_S
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            ref_epoch_s = json.load(fh)["epoch_seconds_median"]
    vs_baseline = round(ref_epoch_s / epoch_s, 2) if ref_epoch_s else None

    print(
        json.dumps(
            {
                "metric": "tiktok_train_epoch_throughput",
                "value": round(epochs_per_hr, 1),
                "unit": "epochs/hr",
                "vs_baseline": vs_baseline,
                "detail": {
                    "epoch_seconds_median_steady": round(epoch_s, 3),
                    "epoch_seconds_all": [round(t, 2) for t in times],
                    "baseline": "torch-CPU reference epoch (bench_baseline.json)",
                    "baseline_epoch_seconds": ref_epoch_s,
                    "device": "default jax device",
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
