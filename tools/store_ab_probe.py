"""Interleaved A/B of the sparse-form train store: dense (U, I) vs O(nnz) CSR.

Round 5 moved the sparse graph form onto the CSR membership store
(train.train_store=auto -> csr; data/membership.py) and the next bench's
sparse fused row moved 0.649 -> 0.815 s/epoch vs round 4 — but those are
different-process tunnel measurements (documented +-10% drift, sometimes
more), so this tool measures the store delta the only trustworthy way in
this environment: two Coaches in ONE process, fused chunks and fenced
single epochs interleaved A,B,A,B,... so service drift hits both arms
equally. Per-phase fenced medians attribute any delta to the phases that
actually consume the store (diffusion rows, negative sampling, eval mask);
the joint phase reads only embeddings + edge lists and should be a wash.

  python tools/store_ab_probe.py -c conf/tiktok_tuned.toml --chunks 3

Prints one JSON line; record in DESIGN.md / sweeps/.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", "-c", default="conf/tiktok_tuned.toml")
    ap.add_argument("--chunks", type=int, default=3, help="fused chunks per arm")
    ap.add_argument("--fenced", type=int, default=3, help="fenced epochs per arm")
    ap.add_argument("--scan", type=int, default=10, help="epochs per fused chunk")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from diffmm_tpu.config import load_config
    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.train.coach import Coach
    from diffmm_tpu.utils.logging import Log

    base = load_config(args.config)
    base.train.graph_form = "sparse"
    host = load_host_data(base)
    log = Log("store_ab", base.data.name)

    coaches = {}
    for store in ("dense", "csr"):
        cfg = copy.deepcopy(base)
        cfg.train.train_store = store
        coaches[store] = Coach(cfg, host, log=log)
        assert coaches[store].train_store_form == store

    # warm both single-epoch programs (compile) before any timing
    ep = 0
    for store, coach in coaches.items():
        coach.train_epoch(ep)
        jax.block_until_ready(coach.gcn_params["u_embs"])
        ep += 1

    # fenced single epochs, interleaved: per-phase attribution
    phases: dict[str, dict[str, list[float]]] = {s: {} for s in coaches}
    for _ in range(args.fenced):
        for store, coach in coaches.items():
            coach.timer.reset()
            coach.train_epoch(ep, fence=True)
            ep += 1
            for name, total in coach.timer.totals.items():
                phases[store].setdefault(name, []).append(total)

    # fused chunks, interleaved: the production-path headline
    for store, coach in coaches.items():  # compile chunk per arm
        coach.train_epochs_fused(ep, args.scan)
        jax.block_until_ready(coach.gcn_params["u_embs"])
        ep += args.scan
    fused: dict[str, list[float]] = {s: [] for s in coaches}
    for _ in range(args.chunks):
        for store, coach in coaches.items():
            t0 = time.perf_counter()
            coach.train_epochs_fused(ep, args.scan)
            jax.block_until_ready(coach.gcn_params["u_embs"])
            fused[store].append((time.perf_counter() - t0) / args.scan)
            ep += args.scan
            print(
                f"fused[{store}]: {fused[store][-1]:.3f}s/epoch",
                file=sys.stderr, flush=True,
            )

    med = lambda v: round(float(np.median(v)), 4)
    result = {
        "config": args.config,
        "backend": jax.default_backend(),
        "scan": args.scan,
        "fused_epoch_s": {s: med(v) for s, v in fused.items()},
        "fenced_phase_s": {
            s: {k: med(v) for k, v in ph.items()} for s, ph in phases.items()
        },
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
