"""Measure the PyTorch reference's per-epoch wall clock on this machine (CPU).

Runs the unmodified reference (`/root/reference/Main.py` Coach) on tiktok for
a few epochs and writes the median epoch seconds to ``bench_baseline.json`` at
the repo root. This is the denominator of the north-star throughput target
(BASELINE.json: ">=20x epoch throughput vs the PyTorch CPU reference").

The bare image lacks two of the reference's imports, so minimal shims are
injected before importing it:
  * ``toml``  -> thin wrapper over stdlib ``tomllib``;
  * ``numba`` -> identity ``njit`` decorator + ``prange=range`` (only used by
    the reference's commented-out KNN ablation, never called).
The reference resolves datasets relative to CWD (`DataHandler.py:18-25`) and
tiktok's ``text_feat.npy`` is missing from the read-only mount, so a sandbox
dir with symlinks + a synthesized float16 (6710, 768) text blob is used.

Usage: python tools/bench_reference.py [--epochs 3] [--out bench_baseline.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def install_shims() -> None:
    import tomllib

    toml = types.ModuleType("toml")

    def load(f):
        if hasattr(f, "read"):  # the reference passes an open text file
            data = f.read()
            if isinstance(data, bytes):
                data = data.decode()
            return tomllib.loads(data)
        with open(f, "rb") as fh:
            return tomllib.load(fh)

    toml.load = load
    sys.modules["toml"] = toml

    numba = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda fn: fn

    numba.njit = njit
    numba.prange = range
    sys.modules["numba"] = numba

    # The reference targets Python 3.9; 3.12 rejects its mutable dataclass
    # defaults (`Conf.py:63-66`). Load `Conf` with default_factory instead —
    # identical semantics, modern interpreter.
    import re

    with open(os.path.join(REF, "Conf.py")) as fh:
        src = fh.read()
    src = src.replace(
        "from dataclasses import dataclass",
        "from dataclasses import dataclass, field",
    )
    src = re.sub(
        r"= (\w+Config)\(\)", r"= field(default_factory=\1)", src
    )
    conf = types.ModuleType("Conf")
    sys.modules["Conf"] = conf  # must be registered before exec: dataclass
    # processing looks up sys.modules[cls.__module__]
    exec(compile(src, os.path.join(REF, "Conf.py"), "exec"), conf.__dict__)


def make_sandbox() -> str:
    import numpy as np

    sandbox = os.path.join(REPO, ".bench_ref")
    ds = os.path.join(sandbox, "Datasets", "tiktok")
    os.makedirs(ds, exist_ok=True)
    os.makedirs(os.path.join(sandbox, "logs"), exist_ok=True)
    for fname in ("trnMat.pkl", "tstMat.pkl", "image_feat.npy", "audio_feat.npy"):
        dst = os.path.join(ds, fname)
        if not os.path.exists(dst):
            os.symlink(os.path.join(REF, "Datasets", "tiktok", fname), dst)
    text = os.path.join(ds, "text_feat.npy")
    if not os.path.exists(text):
        rng = np.random.default_rng(0)
        np.save(text, rng.standard_normal((6710, 768)).astype(np.float16))
    return sandbox


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--out", default=os.path.join(REPO, "bench_baseline.json"))
    args = parser.parse_args()

    install_shims()
    sandbox = make_sandbox()
    os.chdir(sandbox)
    sys.path.insert(0, REF)

    import torch

    torch.manual_seed(0)
    # prepareModel calls .cuda(device) unconditionally (`Main.py:88-110`)
    # even when the chosen device is CPU; neutralize for the CPU measurement.
    torch.nn.Module.cuda = lambda self, device=None: self
    torch.Tensor.cuda = lambda self, device=None, **kw: self

    from Conf import load_config  # noqa: E402 (reference module)
    from DataHandler import DataHandler  # noqa: E402
    import Main  # noqa: E402
    from Main import Coach, seed_it  # noqa: E402
    from Utils.Log import Log  # noqa: E402

    # The reference's conf/test.toml is stale against its own Conf.py schema
    # (legacy `trans` key raises TypeError); conf/tiktok.toml is the runnable
    # tiktok config. Runtime cost is identical (same shapes/epochs).
    config = load_config(os.path.join(REF, "conf", "tiktok.toml"))
    # Coach reads module globals (`main_log`, `config`) that the reference
    # only sets in its __main__ block (`Main.py:459-487`; the prepareModel
    # global-config closure is documented in SURVEY.md §2.2).
    Main.main_log = Log("main", config.data.name)
    Main.config = config
    seed_it(config.base.seed)
    handler = DataHandler(config)
    handler.LoadData()
    coach = Coach(handler, config)
    coach.prepareModel()

    epoch_times = []
    for ep in range(args.epochs):
        t0 = time.perf_counter()
        coach.trainEpoch()
        dt = time.perf_counter() - t0
        epoch_times.append(dt)
        print(f"reference epoch {ep}: {dt:.1f}s", flush=True)

    t0 = time.perf_counter()
    coach.testEpoch()
    eval_s = time.perf_counter() - t0

    epoch_times.sort()
    median = epoch_times[len(epoch_times) // 2]
    result = {
        "reference": "sun2ot/DiffMM @ /root/reference",
        "dataset": "tiktok",
        "device": "cpu (torch, this machine)",
        "epochs_timed": args.epochs,
        "epoch_seconds_median": round(median, 2),
        "epoch_seconds_all": [round(t, 2) for t in epoch_times],
        "eval_seconds": round(eval_s, 2),
        "train_nnz": 59541,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
