"""Probe whether JAX's persistent compilation cache intercepts this
environment's backend (VERDICT r3 #8: first-compile over the remote
tunnel costs 35 s–9 min; if the on-disk cache worked, only the first
process would ever pay it).

Methodology: run the SAME non-trivial jitted program in two consecutive
child processes with `jax_compilation_cache_dir` pointed at a fresh
directory, `jax_persistent_cache_min_compile_time_secs=0` and
`jax_persistent_cache_min_entry_size_bytes=-1` (cache everything). If the
backend honors the cache: (a) the directory gains entries after run 1 and
(b) run 2's compile time collapses.

  python tools/compile_cache_probe.py            # probe on default device
  python tools/compile_cache_probe.py --child N  # internal

Prints one JSON line; record the finding in DESIGN.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(run_id: int) -> int:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(a, b):
        # big enough that XLA compile is non-trivial; data-dependent chain
        def step(c, _):
            c = jnp.tanh(c @ b) + a
            return c, None
        out, _ = jax.lax.scan(step, a, None, length=16)
        return jnp.sum(out)

    a = jnp.ones((1024, 1024), jnp.float32)
    b = jnp.eye(1024, dtype=jnp.float32) * 0.01
    t0 = time.perf_counter()
    jax.block_until_ready(prog(a, b))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(prog(a + 1.0, b))
    steady_s = time.perf_counter() - t0
    print(json.dumps({
        "run": run_id,
        "backend": jax.default_backend(),
        "first_call_s": round(compile_s, 3),
        "steady_call_s": round(steady_s, 3),
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--child", type=int, default=None)
    p.add_argument("--cache-dir", default=None)
    args = p.parse_args(argv)
    if args.child is not None:
        return child(args.child)

    cache_dir = args.cache_dir or tempfile.mkdtemp(prefix="jaxcache_probe_")
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"

    runs = []
    entries = []
    for i in (1, 2):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(i)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        runs.append(json.loads(line[-1]) if line else {"error": out.stderr[-300:]})
        entries.append(len(os.listdir(cache_dir)))

    first = runs[0].get("first_call_s")
    second = runs[1].get("first_call_s")
    print(json.dumps({
        "cache_dir_entries_after_run": entries,
        "runs": runs,
        "cache_effective": bool(
            entries[0] > 0 and first and second and second < 0.5 * first
        ),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
