"""End-to-end latency benchmark for the HTTP serving front-end.

Spawns ``diffmm_tpu.eval.serve_http`` on an exported index, warms the k
bucket, then drives closed-loop GET /recommend traffic from N client
threads and reports p50/p95/p99 latency and throughput as one JSON line.
The reference has no serving path (SURVEY.md §5.4); these numbers back the
README's serving section.

  python tools/serve_bench.py index.npz --requests 2000 --clients 4
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _wait_health(base: str, deadline_s: float = 600.0) -> dict:
    t0 = time.time()
    while time.time() - t0 < deadline_s:
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
    args = p.parse_args(argv)

    cmd = [
        sys.executable, "-m", "diffmm_tpu.eval.serve_http", args.index,
        "--port", str(args.port), "--warmup", str(args.k),
    ]
    if args.approx:
        cmd.append("--approx")
    server = subprocess.Popen(cmd, cwd=REPO)
    base = f"http://127.0.0.1:{args.port}"
    try:
        health = _wait_health(base)
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
