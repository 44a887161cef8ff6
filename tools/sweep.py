"""Hyperparameter sweep harness — script equivalent of the reference's
sampling-step sensitivity experiments (`notebooks/visualization.ipynb`
cells 1-2, which report tiktok Recall/NDCG across sampling_step 0..4, and
the commented-out sweep driver at reference `Main.py:491-521`).

One Coach is reused across sweep values (Coach.reset + traced sampling_step),
so the very slow first compile is paid once.

  python tools/sweep.py -c conf/tiktok.toml --param sampling_step \
      --values 0,1,2,3,4 --epochs 60 --out sweep_results.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmm_tpu.config import load_config
from diffmm_tpu.data.loader import load_host_data
from diffmm_tpu.train.coach import Coach
from diffmm_tpu.utils.logging import Log


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", default="conf/tiktok.toml")
    parser.add_argument("--param", default="sampling_step",
                        help="hyper.<param> to sweep")
    parser.add_argument("--values", default="0,1,2,3,4",
                        help="comma-separated values")
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--out", default="sweep_results.json")
    parser.add_argument("--data-root", default=None)
    args = parser.parse_args(argv)

    config = load_config(args.config)
    host = load_host_data(config, data_root=args.data_root)
    log = Log("sweep", config.data.name)
    coach = Coach(config, host, log=log)

    # All scalar hypers are traced into the jitted phase programs (read from
    # config each epoch), so sweeping them on a reused Coach is recompile-
    # free; "seed" re-initializes via Coach.reset. Only structural knobs
    # (cl_method, steps, denoise_dim, latdim, graph_form, ...) need a fresh
    # process.
    DYNAMIC_SAFE = {
        "sampling_step", "seed", "sim_weight", "noise_degree",
        "cross_cl_temp", "cross_cl_rate", "modal_cl_temp", "modal_cl_rate",
        "modal_adj_weight", "residual_weight",
    }
    if args.param not in DYNAMIC_SAFE:
        raise SystemExit(
            f"--param {args.param} is a compile-time constant; sweeping it on "
            f"a reused Coach would silently keep the old value. Run separate "
            f"processes instead (dynamic-safe params: {sorted(DYNAMIC_SAFE)})."
        )
    if args.param == "seed":
        values = [int(v) for v in args.values.split(",")]
    else:
        caster = type(getattr(config.hyper, args.param))
        values = [caster(v) for v in args.values.split(",")]

    results = []
    for i, value in enumerate(values):
        if args.param == "seed":
            coach.reset(seed=value)
        else:
            if i > 0:
                coach.reset()
            setattr(config.hyper, args.param, value)
        log.info(f"🔁 sweep {args.param} = {value}")
        best = coach.run(epochs=args.epochs)
        results.append({args.param: value, **best})
        log.info(f"sweep {args.param}={value}: {best}")
        # persist incrementally: long sweeps survive interruption
        with open(args.out, "w") as fh:
            json.dump(
                {
                    "config": args.config,
                    "param": args.param,
                    "epochs": args.epochs,
                    "results": results,
                },
                fh,
                indent=2,
            )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
