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
    # BENCH_SET="train.dense_store=int4,base.denoise_param_dtype=bf16":
    # config overrides for A/B bench runs, same spelling as sweep/CLI --set
    overrides = [o for o in os.environ.get("BENCH_SET", "").split(",") if o]
    if overrides:
        from diffmm_tpu.config import apply_overrides

        apply_overrides(config, overrides)
        for override in overrides:
            print(f"override: {override}", file=sys.stderr)
    host = load_host_data(config)
    log = Log("bench", config.data.name)
    coach = Coach(config, host, log=log)

    import jax

    times = []
    phase_times: dict[str, list[float]] = {}
    for ep in range(epochs):
        coach.timer.reset()
        t0 = time.perf_counter()
        coach.train_epoch(ep)
        jax.block_until_ready(coach.gcn_params["u_embs"])
        times.append(time.perf_counter() - t0)
        for name, total in coach.timer.totals.items():
            phase_times.setdefault(name, []).append(total)
        print(f"epoch {ep}: {times[-1]:.2f}s", file=sys.stderr, flush=True)

    # Fenced-attribution epochs: per-phase timers with a device fence at
    # every phase boundary. Without fences, a phase ending in a dispatch
    # (rebuild — its outputs feed the joint scan) bills its device time to
    # the next phase that blocks; the unfenced "joint" median historically
    # carried most of the rebuild's device time. Unfenced totals above stay
    # the headline (production epochs overlap); these are the attribution.
    fenced_phase_times: dict[str, list[float]] = {}
    for ep in range(3):
        coach.timer.reset()
        coach.train_epoch(epochs + ep, fence=True)
        for name, total in coach.timer.totals.items():
            fenced_phase_times.setdefault(name, []).append(total)

    # Fused epoch scan (train.epoch_scan): E epochs as ONE compiled program
    # — the production fast path; amortizes the per-epoch dispatch round
    # trips (~28 ms each over this environment's tunnel) to 1/E. The tunnel
    # memoizes identical re-executions, but every chunk here advances params
    # and uses fresh permutations, so each is a real execution.
    fused_epoch_s = None
    # E=10 sits near the asymptote: measured 0.397 (E=5) / 0.380 (E=10) /
    # 0.375 (E=20) s/epoch vs 0.43 single-epoch in the same runs.
    fused_scan = int(os.environ.get("BENCH_FUSED", "10"))
    if fused_scan > 1 and times[0] > 300.0:
        # tunnel remote-compile service is in a slow phase (first compile
        # has ranged 34 s - 8 min for the same program); skip the second
        # big compile so the artifact lands within any driver budget
        print(
            f"skipping fused-scan measurement: first compile took "
            f"{times[0]:.0f}s (slow-compile day)", file=sys.stderr,
        )
        fused_scan = 0
    if fused_scan > 1:
        ep0 = epochs + 3
        coach.train_epochs_fused(ep0, fused_scan)  # compile chunk
        jax.block_until_ready(coach.gcn_params["u_embs"])
        f_times = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            coach.train_epochs_fused(ep0 + i * fused_scan, fused_scan)
            jax.block_until_ready(coach.gcn_params["u_embs"])
            f_times.append((time.perf_counter() - t0) / fused_scan)
            print(
                f"fused chunk {i}: {f_times[-1]:.3f}s/epoch (scan={fused_scan})",
                file=sys.stderr, flush=True,
            )
        fused_epoch_s = sorted(f_times)[len(f_times) // 2]

    # Eval latency: full-catalog ranking over all test users (the serving-
    # shaped program). First call may compile; median of the rest.
    eval_times = []
    for _ in range(4):
        t0 = time.perf_counter()
        coach.test_epoch()
        eval_times.append(time.perf_counter() - t0)
    eval_s = sorted(eval_times[1:])[len(eval_times[1:]) // 2]
    print(f"eval: {eval_s:.3f}s", file=sys.stderr, flush=True)

    # Sparse/segsum graph form (the web-scale path — guards the Pallas
    # sorted-segment-sum kernels; BENCH_SPARSE=0 skips). Measured at the
    # same production treatment as the dense form: single epochs for
    # attribution, then the fused epoch scan (one compiled program per E
    # epochs) as the sparse headline row.
    sparse_epoch_s = None
    sparse_fused_epoch_s = None
    sparse_train_store = None
    if os.environ.get("BENCH_SPARSE", "1") != "0":
        import copy

        s_config = copy.deepcopy(config)
        s_config.train.graph_form = "sparse"
        # sparse production setting: bf16 messages on the kernel paths (the
        # dense form's own matmul rounding policy; ~2.5% on tiktok, more
        # where gathers dominate). BENCH_SPARSE_COMPUTE=f32 reverts.
        s_config.train.segsum_compute = os.environ.get(
            "BENCH_SPARSE_COMPUTE", "bf16"
        )
        s_coach = Coach(s_config, host, log=log)
        sparse_train_store = s_coach.train_store_form
        s_times = []
        for ep in range(max(3, epochs // 2)):
            t0 = time.perf_counter()
            s_coach.train_epoch(ep)
            jax.block_until_ready(s_coach.gcn_params["u_embs"])
            s_times.append(time.perf_counter() - t0)
            print(f"sparse epoch {ep}: {s_times[-1]:.2f}s", file=sys.stderr, flush=True)
        steady_s = sorted(s_times[1:]) if len(s_times) > 1 else s_times
        sparse_epoch_s = steady_s[len(steady_s) // 2]
        sf_scan = int(os.environ.get("BENCH_SPARSE_FUSED", str(fused_scan or 10)))
        if sf_scan > 1 and s_times[0] < 300.0:
            ep0 = max(3, epochs // 2)
            s_coach.train_epochs_fused(ep0, sf_scan)  # compile chunk
            jax.block_until_ready(s_coach.gcn_params["u_embs"])
            sf_times = []
            for i in range(1, 4):
                t0 = time.perf_counter()
                s_coach.train_epochs_fused(ep0 + i * sf_scan, sf_scan)
                jax.block_until_ready(s_coach.gcn_params["u_embs"])
                sf_times.append((time.perf_counter() - t0) / sf_scan)
                print(
                    f"sparse fused chunk {i}: {sf_times[-1]:.3f}s/epoch "
                    f"(scan={sf_scan})", file=sys.stderr, flush=True,
                )
            sparse_fused_epoch_s = sorted(sf_times)[len(sf_times) // 2]

    steady = sorted(times[1:]) if len(times) > 1 else times
    epoch_s = steady[len(steady) // 2]
    # Headline: the fastest sustained-training path. The fused scan is the
    # recommended production configuration (train.epoch_scan with tstEpoch
    # aligned); the single-epoch medians stay in detail for comparability.
    headline_s = epoch_s
    headline_path = "single_epoch"
    if fused_epoch_s is not None and fused_epoch_s < epoch_s:
        headline_s = fused_epoch_s
        headline_path = f"fused_epoch_scan{fused_scan}"
    epochs_per_hr = 3600.0 / headline_s

    # Per-phase steady-state medians (VERDICT r2: a regression confined to
    # one phase hides inside the epoch median without these).
    def _median_steady(vals):
        v = sorted(vals[1:]) if len(vals) > 1 else vals
        return round(v[len(v) // 2], 4)

    phase_medians = {k: _median_steady(v) for k, v in phase_times.items()}
    fenced_medians = {
        k: round(sorted(v)[len(v) // 2], 4)
        for k, v in fenced_phase_times.items()
    }

    # Joint-step HBM-roofline fraction (machine-checkable form of the
    # DESIGN.md roofline claim): the exact joint-step algorithm moves ~26
    # passes over the (U, I) adjacency block per step (10 propagation
    # passes forward + backward + CL re-propagations); at the dense store
    # width that's the dominant HBM traffic. fraction = roofline_s /
    # measured_s — ~0.6 historically on v5e (819 GB/s HBM).
    roofline_fraction = None
    if jax.default_backend() == "tpu" and coach.dense_graphs:
        adj_pass_bytes = (
            host.user_num * host.item_num * coach.dense_store_bytes_per_cell
        )
        n_joint_blocks = max(1, -(-host.nnz // config.train.batch))
        # attribution from the FENCED joint median: the unfenced one absorbs
        # upstream (rebuild) device time and understates the fraction
        joint_s = fenced_medians.get("joint") or phase_medians.get("joint")
        if joint_s:
            roofline_s = 26 * adj_pass_bytes / 819e9
            roofline_fraction = round(
                roofline_s / (joint_s / n_joint_blocks), 3
            )

    baseline_path = os.path.join(REPO, "bench_baseline.json")
    ref_epoch_s = FALLBACK_REF_EPOCH_S
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            ref_epoch_s = json.load(fh)["epoch_seconds_median"]
    vs_baseline = round(ref_epoch_s / headline_s, 2) if ref_epoch_s else None

    print(
        json.dumps(
            {
                "metric": "tiktok_train_epoch_throughput",
                "value": round(epochs_per_hr, 1),
                "unit": "epochs/hr",
                "vs_baseline": vs_baseline,
                "detail": {
                    "headline_epoch_seconds": round(headline_s, 3),
                    "headline_path": headline_path,
                    "epoch_seconds_median_steady": round(epoch_s, 3),
                    "fused_epoch_seconds_median": (
                        round(fused_epoch_s, 3) if fused_epoch_s else None
                    ),
                    "epoch_seconds_all": [round(t, 2) for t in times],
                    "phase_seconds_median_steady": phase_medians,
                    "phase_seconds_fenced": fenced_medians,
                    "joint_hbm_roofline_fraction": roofline_fraction,
                    "eval_seconds_median": round(eval_s, 3),
                    "sparse_epoch_seconds_median": (
                        round(sparse_epoch_s, 3) if sparse_epoch_s else None
                    ),
                    "sparse_fused_epoch_seconds_median": (
                        round(sparse_fused_epoch_s, 3)
                        if sparse_fused_epoch_s else None
                    ),
                    # round 5: the sparse rows run the O(nnz) CSR membership
                    # store (train.train_store auto) — the form's actual
                    # web-scale configuration; r4 sparse rows were dense-store
                    "sparse_train_store": sparse_train_store,
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
