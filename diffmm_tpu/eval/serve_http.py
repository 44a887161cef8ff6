"""Minimal HTTP serving front-end over an exported recommendation index.

    python -m diffmm_tpu.eval.serve_http index.npz --port 8188

    GET /health            -> {"status": "ok", "users": U, "items": I}
    GET /recommend?user=42&k=20[&mask_seen=0] -> {"user": 42, "items": [...],
                                                  "scores": [...]}

Stdlib-only (no server deps in the image); one jitted matmul + top-k per
request via eval/serving.py. The reference has no serving path at all
(SURVEY.md §5.4) — this is the deployment surface of the framework.
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax.numpy as jnp

from diffmm_tpu.eval.serving import RecIndex, load_index, recommend


def make_handler(index: RecIndex, approx: bool = False, mesh=None):
    user_num = index.u_final.shape[0]
    item_num = index.i_final.shape[0]

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args) -> None:  # quiet
            pass

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            if url.path == "/health":
                return self._send(
                    200, {"status": "ok", "users": user_num, "items": item_num}
                )
            if url.path != "/recommend":
                return self._send(404, {"error": f"unknown path {url.path}"})
            q = parse_qs(url.query)
            try:
                user = int(q["user"][0])
                k = int(q.get("k", ["20"])[0])
                mask_seen = q.get("mask_seen", ["1"])[0] not in ("0", "false")
            except (KeyError, ValueError) as e:
                return self._send(400, {"error": f"bad query: {e}"})
            if not (0 <= user < user_num):
                return self._send(
                    400, {"error": f"user {user} out of range [0, {user_num})"}
                )
            if not (1 <= k <= item_num):
                return self._send(
                    400, {"error": f"k {k} out of range [1, {item_num}]"}
                )
            ids, scores = recommend(
                index, jnp.asarray([user], dtype=jnp.int32), k, mask_seen,
                approx=approx, mesh=mesh,
            )
            return self._send(
                200,
                {
                    "user": user,
                    "items": [int(i) for i in ids[0]],
                    "scores": [float(s) for s in scores[0]],
                },
            )

    return Handler


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="serve top-k recommendations")
    parser.add_argument("index", help="npz index from --export-index")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8188)
    parser.add_argument(
        "--approx", action="store_true",
        help="hardware-bucketed approx_max_k (0.95 recall target) instead "
        "of exact top-k; pays off on very large catalogs",
    )
    parser.add_argument(
        "--model-shards", type=int, default=1, metavar="M",
        help="serve the catalog column-sharded over M devices (exact "
        "distributed top-k per request; requires M | item_num and M | "
        "device count)",
    )
    parser.add_argument(
        "--warmup", default=None, metavar="K1,K2,...",
        help="pre-compile the serving programs for these k values before "
        "accepting requests (e.g. --warmup 10,20,100); no live request "
        "then pays the first-hit XLA compile",
    )
    args = parser.parse_args(argv)

    mesh = None
    if args.model_shards > 1:
        import jax as _jax

        from diffmm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(
            len(_jax.devices()), model_parallel=args.model_shards
        )
    index = load_index(args.index, mesh=mesh)
    if mesh is not None and index.i_final.shape[0] % args.model_shards:
        # recommend() and place_index() both fall back to the replicated
        # program for a non-dividing catalog — say so instead of banner-
        # advertising a sharding that is not in effect
        print(
            f"WARNING: catalog {index.i_final.shape[0]} does not divide "
            f"--model-shards {args.model_shards}; serving REPLICATED",
            flush=True,
        )
        mesh = None
    if args.warmup:
        from diffmm_tpu.eval.serving import warmup

        ks = [int(v) for v in args.warmup.split(",")]
        print(f"warming up k={ks} ...", flush=True)
        warmup(index, ks, approx=args.approx, mesh=mesh)
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(index, approx=args.approx, mesh=mesh)
    )
    print(
        f"serving ({index.u_final.shape[0]}, {index.i_final.shape[0]}) "
        f"index on http://{args.host}:{server.server_address[1]}"
        + (f" [model-sharded x{args.model_shards}]" if mesh is not None else ""),
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
