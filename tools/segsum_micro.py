"""Microbench the sorted-segment-sum variants + ranked-path components on
the live device (amortized-scan methodology of tools/joint_profile.py).

  python tools/segsum_micro.py [--nnz 59904] [--segments 6710] [--d 64]

Prints one JSON line with per-call milliseconds for: XLA scatter, the raw
planned kernel (static layout), the rank-space form, and the rank-space
form's individual components (cumsum, searchsorted inversion, kernel).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def median_time(fn, reps: int = 7, warmup: int = 2) -> float:
    for i in range(warmup):
        jax.block_until_ready(fn(-1 - i))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(i))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_looped(body, inner: int):
    @jax.jit
    def run(carry):
        def step(c, _):
            return body(c), None

        out, _ = jax.lax.scan(step, carry, None, length=inner)
        return out

    return lambda i: run(jnp.float32(i) * 1e-30)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nnz", type=int, default=59904)
    p.add_argument("--segments", type=int, default=6710)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--inner", type=int, default=64)
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--compute", default="f32", choices=["f32", "bf16"])
    args = p.parse_args(argv)

    from diffmm_tpu.ops.pallas.segsum import (
        make_ranked_plan,
        make_segsum_plan,
        ranked_segment_sum,
        sorted_segment_sum_planned,
    )

    rng = np.random.default_rng(0)
    # gap-bearing sorted ids (the dynamic modality item layout shape)
    ids_np = np.sort(rng.integers(0, args.segments, args.nnz)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    msgs0 = jnp.asarray(
        rng.standard_normal((args.nnz, args.d)).astype(np.float32)
    )
    if args.compute == "bf16":
        msgs0 = msgs0.astype(jnp.bfloat16)
    n = args.segments
    static_plan = make_segsum_plan(ids_np, n, args.d, chunk=args.chunk)
    ranked_plan = make_ranked_plan(args.nnz, args.d, chunk=args.chunk)
    interpret = jax.default_backend() == "cpu"

    K = args.inner
    trivial = jax.jit(lambda x: x + 1.0)
    dispatch_s = median_time(lambda i: trivial(jnp.float32(i)), reps=10)

    def amortized_ms(body) -> float:
        t = median_time(make_looped(body, K))
        return (t - dispatch_s) / K * 1e3

    def probe(x):
        return jnp.sum(x).astype(jnp.float32) * 1e-30

    res = {
        "nnz": args.nnz, "segments": n, "d": args.d, "chunk": args.chunk,
        "compute": args.compute,
        "backend": jax.default_backend(),
        "static_plan_pieces": len(static_plan) if static_plan else None,
        "dispatch_ms": round(dispatch_s * 1e3, 3),
    }

    def scatter_body(c):
        m = (msgs0 + c.astype(msgs0.dtype)).astype(jnp.float32)
        return probe(jax.ops.segment_sum(m, ids, num_segments=n,
                                         indices_are_sorted=True))

    res["xla_scatter_ms"] = round(amortized_ms(scatter_body), 3)

    if static_plan is not None:
        def planned_body(c):
            out = sorted_segment_sum_planned(
                msgs0 + c.astype(msgs0.dtype), ids, n, static_plan,
                chunk=args.chunk, interpret=interpret,
            )
            return probe(out)

        res["planned_ms"] = round(amortized_ms(planned_body), 3)

    def ranked_body(c):
        out = ranked_segment_sum(
            msgs0 + c.astype(msgs0.dtype), ids, n, ranked_plan,
            interpret=interpret,
        )
        return probe(out)

    res["ranked_ms"] = round(amortized_ms(ranked_body), 3)

    # components of the ranked path
    def cumsum_body(c):
        ids2 = ids + c.astype(jnp.int32)
        changed = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (ids2[1:] != ids2[:-1]).astype(jnp.int32)]
        )
        return probe(jnp.cumsum(changed))

    res["cumsum_ms"] = round(amortized_ms(cumsum_body), 3)

    def searchsorted_body(c):
        ids2 = ids + c.astype(jnp.int32)
        seg = jnp.arange(n, dtype=jnp.int32)
        pos = jnp.searchsorted(ids2, seg)
        return probe(pos)

    res["searchsorted_ms"] = round(amortized_ms(searchsorted_body), 3)

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
