"""Attribute the fused-run wall overhead: host prep vs upload vs dispatch.

A 300-epoch tiktok_tuned fused run measured 5m17s wall against ~84 s of
device time — this probe times one chunk's components to find where the
rest goes on the tunnel environment.

Measured verdict (v5e over the tunnel, E=10, tiktok_tuned): steady chunks
run 0.286 s/epoch wall vs the 0.274 s/epoch device median — ~4% combined
overhead for host prep + the ~2.4 MB permutation upload + dispatch +
result fetch. The upload overlaps async dispatch (a cold synchronous
transfer of the same bytes costs 2.15 s at the tunnel's ~1 MB/s), so the
5m17s-vs-84s gap was compile (46 s first chunk; up to 9 min under service
load) and tunnel stalls, not per-chunk host work. Recorded in DESIGN.md's
fused-scan section.

Usage: python tools/fused_overhead_probe.py [conf] [epoch_scan]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    conf = sys.argv[1] if len(sys.argv) > 1 else "conf/tiktok_tuned.toml"
    scan = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from diffmm_tpu.config import load_config
    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.train.coach import Coach
    from diffmm_tpu.utils.logging import Log

    cfg = load_config(conf)
    cfg.train.epoch_scan = scan
    host = load_host_data(cfg)
    coach = Coach(cfg, host, log=Log("probe", cfg.data.name))

    # upload bandwidth probe: one permutation-block-sized array
    nb_j = -(-host.nnz // cfg.train.batch)
    blob = np.random.randint(
        0, host.nnz, size=(scan, nb_j, cfg.train.batch)
    ).astype(np.int32)
    t0 = time.perf_counter()
    dev = jnp.asarray(blob)
    float(dev.sum())  # force the transfer + a tiny reduce
    up_s = time.perf_counter() - t0
    mb = blob.nbytes / 1e6
    print(f"upload probe: {mb:.1f} MB in {up_s:.2f}s = {mb / up_s:.1f} MB/s")

    # compile chunk
    t0 = time.perf_counter()
    coach.train_epochs_fused(0, scan, eval_split="test")
    float(coach.gcn_params["u_embs"][0, 0])
    print(f"compile+first chunk: {time.perf_counter() - t0:.1f}s")

    # steady chunks: wall per chunk, then wall with results left unfetched
    for i in range(1, 4):
        t0 = time.perf_counter()
        coach.train_epochs_fused(i * scan, scan, eval_split="test")
        t1 = time.perf_counter()
        float(coach.gcn_params["u_embs"][0, 0])
        t2 = time.perf_counter()
        print(
            f"chunk {i}: call(incl. host prep+upload+result fetch)="
            f"{t1 - t0:.2f}s  +device drain={t2 - t1:.2f}s  "
            f"-> {(t2 - t0) / scan:.3f}s/epoch wall"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
