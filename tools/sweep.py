"""Hyperparameter sweep harness — script equivalent of the reference's
sampling-step sensitivity experiments (`notebooks/visualization.ipynb`
cells 1-2, which report tiktok Recall/NDCG across sampling_step 0..4, and
the commented-out sweep driver at reference `Main.py:491-521`).

One Coach is reused across sweep values (Coach.reset + traced sampling_step),
so the very slow first compile is paid once.

  python tools/sweep.py -c conf/tiktok.toml --param sampling_step \
      --values 0,1,2,3,4 --epochs 60 --out sweep_results.json

Coordinate-descent mode: sweep several hypers in sequence, fixing each at
its best-Recall winner before moving to the next (still one compile):

  python tools/sweep.py -c conf/tiktok.toml --epochs 300 \
      --plan "residual_weight=0.2,0.35,0.5;cross_cl_rate=0.25,0.5,0.75" \
      --out sweep_plan.json
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


def _cast_values(config, param: str, raw: str) -> list:
    if param == "seed":
        return [int(v) for v in raw.split(",")]
    caster = type(getattr(config.hyper, param))
    return [caster(v) for v in raw.split(",")]


def _sweep_one(coach, config, log, param, values, epochs, *, fresh: bool):
    """Run ``epochs`` for each value of hyper.<param>; return result rows.

    ``fresh``: reset before the first value too (needed when a previous
    sweep leg already trained on this Coach).
    """
    rows = []
    for i, value in enumerate(values):
        if param == "seed":
            coach.reset(seed=value)
        else:
            if i > 0 or fresh:
                coach.reset()
            setattr(config.hyper, param, value)
        log.info(f"🔁 sweep {param} = {value}")
        best = coach.run(epochs=epochs)
        rows.append({param: value, **best})
        log.info(f"sweep {param}={value}: {best}")
    return rows


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", default="conf/tiktok.toml")
    parser.add_argument("--param", default="sampling_step",
                        help="hyper.<param> to sweep")
    parser.add_argument("--values", default="0,1,2,3,4",
                        help="comma-separated values")
    parser.add_argument("--plan", default=None,
                        help="coordinate descent: 'p1=v,v,...;p2=v,v,...' — "
                             "each param is fixed at its best-Recall winner "
                             "before the next is swept (overrides --param)")
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--out", default="sweep_results.json")
    parser.add_argument("--data-root", default=None)
    args = parser.parse_args(argv)

    config = load_config(args.config)
    host = load_host_data(config, data_root=args.data_root)
    log = Log("sweep", config.data.name)
    coach = Coach(config, host, log=log)

    if args.plan:
        legs = []
        for leg in args.plan.split(";"):
            param, _, raw = leg.partition("=")
            param = param.strip()
            if param not in DYNAMIC_SAFE:
                raise SystemExit(
                    f"plan param {param!r} is a compile-time constant "
                    f"(dynamic-safe: {sorted(DYNAMIC_SAFE)})"
                )
            legs.append((param, _cast_values(config, param, raw)))
        report = {"config": args.config, "plan": args.plan,
                  "epochs": args.epochs, "legs": [], "incumbent": {}}
        for li, (param, values) in enumerate(legs):
            rows = _sweep_one(coach, config, log, param, values,
                              args.epochs, fresh=li > 0)
            best = max(rows, key=lambda r: r["Recall"])
            if param != "seed":
                setattr(config.hyper, param, best[param])
                report["incumbent"][param] = best[param]
            report["legs"].append({"param": param, "results": rows,
                                   "winner": best})
            log.info(f"🏁 leg {param}: winner {best[param]} "
                     f"(Recall {best['Recall']:.5f})")
            with open(args.out, "w") as fh:  # survive interruption
                json.dump(report, fh, indent=2)
        print(json.dumps(report["incumbent"]))
        return 0

    if args.param not in DYNAMIC_SAFE:
        raise SystemExit(
            f"--param {args.param} is a compile-time constant; sweeping it on "
            f"a reused Coach would silently keep the old value. Run separate "
            f"processes instead (dynamic-safe params: {sorted(DYNAMIC_SAFE)})."
        )
    values = _cast_values(config, args.param, args.values)

    results = []
    for i, value in enumerate(values):
        rows = _sweep_one(coach, config, log, args.param, [value],
                          args.epochs, fresh=i > 0)
        results.extend(rows)
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
