"""Single-process scale probe: steady epoch seconds for one configuration.

The catalog-scale measurements in DESIGN.md §4 (sports 35,598×18,357;
round-5 yelp 38,403×20,000 — the largest reference catalog,
`notebooks/mkdata.ipynb` matrix-shape output) come from runs shaped like
this: N single epochs (median of the steady ones), optionally followed by
fused chunks at --scan. One process per configuration because the fused
program at these scales can crash the remote TPU worker (bisected
boundary: sports E<=3, sweeps/fused_scan_bisect_r5_sports.json), which
kills the whole process — the caller serializes configurations.

  python tools/scale_probe.py -c conf/yelp.toml \
      --set data.name=synthetic:38403x20000x0.0004 \
      --set train.graph_form=sparse --epochs 3 --scan 2 --chunks 2 \
      --out sweeps/scale_probe_r5_yelp_sparse.json

Cross-process numbers drift ±2-3× on the tunnel (CLAUDE.md); treat rows
from different invocations as scale indicators, not A/B evidence — for
store/form A/B use tools/store_ab_probe.py (interleaved, one process).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", "-c", default="conf/yelp.toml")
    ap.add_argument("--set", action="append", default=[], metavar="SEC.KEY=VAL")
    ap.add_argument("--epochs", type=int, default=3, help="single epochs")
    ap.add_argument("--scan", type=int, default=0,
                    help="fused chunk length (0 = skip the fused program)")
    ap.add_argument("--chunks", type=int, default=2,
                    help="timed fused chunks after the compile chunk")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from diffmm_tpu.config import apply_overrides, load_config
    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.train.coach import Coach
    from diffmm_tpu.utils.logging import Log

    config = load_config(args.config)
    apply_overrides(config, args.set)
    host = load_host_data(config)
    coach = Coach(config, host, log=Log("scale_probe", config.data.name))

    import jax

    result = {
        "config": args.config,
        "set": args.set,
        "backend": jax.default_backend(),
        "shape": [host.user_num, host.item_num],
        "nnz": int(host.nnz),
        "graph_form": "dense" if coach.dense_graphs else "sparse",
        "train_store": coach.train_store_form,
    }

    times = []
    for ep in range(args.epochs):
        t0 = time.perf_counter()
        coach.train_epoch(ep)
        jax.block_until_ready(coach.gcn_params["u_embs"])
        times.append(round(time.perf_counter() - t0, 3))
        print(f"epoch {ep}: {times[-1]:.2f}s", file=sys.stderr, flush=True)
    steady = sorted(times[1:]) if len(times) > 1 else times
    result["epoch_s_all"] = times
    # --epochs 0 = fused-only probe (e.g. bisecting the fused-scan crash
    # boundary when single epochs are already known-good)
    result["epoch_s_median_steady"] = (
        steady[len(steady) // 2] if steady else None
    )

    if args.scan > 1:
        ep0 = args.epochs
        t0 = time.perf_counter()
        coach.train_epochs_fused(ep0, args.scan)
        jax.block_until_ready(coach.gcn_params["u_embs"])
        result["fused_compile_chunk_s"] = round(time.perf_counter() - t0, 1)
        f_times = []
        for i in range(1, args.chunks + 1):
            t0 = time.perf_counter()
            coach.train_epochs_fused(ep0 + i * args.scan, args.scan)
            jax.block_until_ready(coach.gcn_params["u_embs"])
            f_times.append(round((time.perf_counter() - t0) / args.scan, 3))
            print(
                f"fused chunk {i}: {f_times[-1]:.3f}s/epoch (scan={args.scan})",
                file=sys.stderr, flush=True,
            )
        result["fused_scan"] = args.scan
        result["fused_epoch_s_all"] = f_times
        result["fused_epoch_s_median"] = sorted(f_times)[len(f_times) // 2]

    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
