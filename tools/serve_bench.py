"""End-to-end latency benchmark for the HTTP serving front-end.

Spawns ``diffmm_tpu.eval.serve_http`` on an exported index, warms the k
bucket, then drives closed-loop GET /recommend traffic from N client
threads and reports p50/p95/p99 latency and throughput as one JSON line.
The reference has no serving path (SURVEY.md §5.4); these numbers back the
README's serving section.

  python tools/serve_bench.py index.npz --requests 2000 --clients 4
  python tools/serve_bench.py synthetic:9308,6710,64   # tiktok shape

``synthetic:U,I,d`` builds a random-embedding index of that shape first —
serving latency is one matmul + top-k and does not depend on the learned
values, so this measures any deployment shape without a training run.

Single-accelerator environments (e.g. one TPU behind the axon tunnel,
where two device-holding processes stall each other): run THIS process
CPU-forced and hand the accelerator to the spawned server only, via
``SERVE_BENCH_CHILD_ENV`` — a JSON object of env overrides for the child
(value null = unset):

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    SERVE_BENCH_CHILD_ENV='{"PALLAS_AXON_POOL_IPS":"127.0.0.1","JAX_PLATFORMS":"axon"}' \
    python tools/serve_bench.py index.npz
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _synthesize_index(spec: str) -> str:
    """`synthetic:U,I,d` -> temp npz path with random embeddings and a
    tiktok-like ~12 items/user seen-mask (so mask_seen does real work)."""
    u, i, d = (int(v) for v in spec.split(":", 1)[1].split(","))
    rng = np.random.default_rng(0)
    path = os.path.join(tempfile.mkdtemp(prefix="serve_bench_"), "index.npz")
    # ~12 items/user seen lists in the CSR export form (so mask_seen does
    # real work), O(nnz) like a real export
    counts = rng.poisson(12.0, u).clip(1, i)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    indices = rng.integers(0, i, int(indptr[-1])).astype(np.int32)
    np.savez(
        path,
        u_final=rng.standard_normal((u, d), dtype=np.float32),
        i_final=rng.standard_normal((i, d), dtype=np.float32),
        seen_indptr=indptr,
        seen_indices=indices,
    )
    return path


def _wait_health(
    base: str,
    server: subprocess.Popen | None = None,
    deadline_s: float = 600.0,
) -> dict:
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        if server is not None and server.poll() is not None:
            # fail fast instead of polling a corpse for the full deadline
            # (observed: a mesh-validation error in the child left this
            # loop spinning 600 s)
            raise SystemExit(
                f"server exited with code {server.returncode} before "
                "becoming healthy — see its stderr above"
            )
        try:
            with urllib.request.urlopen(f"{base}/health", timeout=5) as r:
                return json.loads(r.read())
        except (urllib.error.URLError, ConnectionError, OSError):
            time.sleep(0.5)
    raise SystemExit("server never became healthy")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("index", help="npz index from --export-index")
    p.add_argument("--port", type=int, default=8377)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--requests", type=int, default=2000)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--approx", action="store_true")
    p.add_argument(
        "--model-shards", type=int, default=1, metavar="M",
        help="serve_http --model-shards: catalog-shard the index over M "
        "devices (per-request distributed top-k). Combine with "
        "SERVE_BENCH_CHILD_ENV to give the child a virtual device mesh, "
        'e.g. {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"}',
    )
    args = p.parse_args(argv)

    if args.index.startswith("synthetic:"):
        args.index = _synthesize_index(args.index)

    cmd = [
        sys.executable, "-m", "diffmm_tpu.eval.serve_http", args.index,
        "--port", str(args.port), "--warmup", str(args.k),
    ]
    if args.approx:
        cmd.append("--approx")
    if args.model_shards > 1:
        cmd += ["--model-shards", str(args.model_shards)]
    env = os.environ.copy()
    for key, val in json.loads(os.environ.get("SERVE_BENCH_CHILD_ENV", "{}")).items():
        if val is None:
            env.pop(key, None)
        else:
            env[key] = str(val)
    server = subprocess.Popen(cmd, cwd=REPO, env=env)
    base = f"http://127.0.0.1:{args.port}"
    try:
        health = _wait_health(base, server)
        users = health["users"]

        lat: list[float] = []
        lock = threading.Lock()
        n_done = 0

        def client(cid: int) -> None:
            nonlocal n_done
            rng_state = cid * 2654435761 % users
            local: list[float] = []
            while True:
                with lock:
                    if n_done >= args.requests:
                        break
                    n_done += 1
                rng_state = (rng_state * 1103515245 + 12345) % users
                t0 = time.perf_counter()
                with urllib.request.urlopen(
                    f"{base}/recommend?user={rng_state}&k={args.k}", timeout=30
                ) as r:
                    body = json.loads(r.read())
                local.append(time.perf_counter() - t0)
                assert len(body["items"]) == args.k
            with lock:
                lat.extend(local)

        # priming round (steady-state only; --warmup already compiled)
        with urllib.request.urlopen(f"{base}/recommend?user=0&k={args.k}") as r:
            r.read()

        t_start = time.perf_counter()
        threads = [
            threading.Thread(target=client, args=(c,))
            for c in range(args.clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_start

        lat.sort()

        def pct(q: float) -> float:
            return lat[min(len(lat) - 1, int(q * len(lat)))]

        out = {
            "metric": "serve_http_latency",
            "unit": "ms",
            "users": health["users"],
            "items": health["items"],
            "k": args.k,
            "clients": args.clients,
            "requests": len(lat),
            "p50_ms": round(pct(0.50) * 1e3, 2),
            "p95_ms": round(pct(0.95) * 1e3, 2),
            "p99_ms": round(pct(0.99) * 1e3, 2),
            "throughput_rps": round(len(lat) / wall, 1),
        }
        print(json.dumps(out))
        return 0
    finally:
        server.terminate()
        server.wait(timeout=30)


if __name__ == "__main__":
    raise SystemExit(main())
