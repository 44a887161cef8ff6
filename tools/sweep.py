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

Forked mode for compile-time (structural) knobs — diffusion schedule
constants, scan lengths, widths, feature-synthesis modes. Each value runs
in its own child process (one compile per value, serialized on the device;
the parent never initializes a backend). Params may be section-qualified:

  python tools/sweep.py -c conf/tiktok.toml --forked \
      --param hyper.noise_scale --values 0.1,0.5,1.0 --epochs 300

  python tools/sweep.py -c conf/tiktok.toml --forked \
      --param data.missing_modalities --values zeros,svd --epochs 300
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffmm_tpu.config import load_config


# All scalar hypers are traced into the jitted phase programs (read from
# config each epoch), so sweeping them on a reused Coach is recompile-
# free; "seed" re-initializes via Coach.reset; the LR is threaded into the
# steps as a runtime scalar (train/optim.py), so the base LR and the
# regularization weight are dynamic too. Only structural knobs (cl_method,
# steps, denoise_dim, latdim, graph_form, ...) need a fresh process.
DYNAMIC_SAFE = {
    "sampling_step", "seed", "sim_weight", "noise_degree",
    "cross_cl_temp", "cross_cl_rate", "modal_cl_temp", "modal_cl_rate",
    "modal_adj_weight", "residual_weight",
    "train.lr", "train.reg",
}


def _is_dynamic_safe(config, param: str) -> bool:
    """Spelling-independent: 'hyper.sim_weight' == 'sim_weight' etc."""
    obj, key = _resolve(config, param)
    for name in (key, f"hyper.{key}", f"train.{key}", f"base.{key}"):
        if name in DYNAMIC_SAFE and _resolve(config, name) == (obj, key):
            return True
    return False


def _resolve(config, qual: str):
    """'hyper.steps' / 'base.latdim' / bare 'steps' (hyper by default;
    bare 'seed' maps to base.seed) -> (section object, field name);
    raises SystemExit on unknown sections/fields. Thin CLI wrapper over
    config.resolve_field (one override spelling across sweep/bench/CLI)."""
    from diffmm_tpu.config import resolve_field

    try:
        return resolve_field(config, qual)
    except ValueError as e:
        raise SystemExit(str(e))


def _cast(caster: type, raw):
    """Cast a CLI string to a config field's type; bool gets real parsing
    (bool('False') is True — the default caster would mangle flags)."""
    from diffmm_tpu.config import cast_field

    try:
        return cast_field(caster, raw)
    except ValueError as e:
        raise SystemExit(str(e))


def _cast_values(config, param: str, raw: str) -> list:
    obj, key = _resolve(config, param)
    caster = type(getattr(obj, key))
    return [_cast(caster, v) for v in raw.split(",")]


def _sweep_one(coach, config, log, param, values, epochs, *, fresh: bool):
    """Run ``epochs`` for each value of hyper.<param>; return result rows.

    ``fresh``: reset before the first value too (needed when a previous
    sweep leg already trained on this Coach).
    """
    rows = []
    for i, value in enumerate(values):
        obj, key = _resolve(config, param)
        if (obj, key) == _resolve(config, "seed"):
            # ANY spelling of the seed ("seed"/"base.seed") must go through
            # reset(seed=...): reset re-inits params/RNG from config.base.seed,
            # so setattr-after-reset would train every value on the stale
            # seed — bit-identical rows (caught live in round 5; the r4 seed
            # bands were --forked and never hit this path).
            coach.reset(seed=value)
        else:
            if i > 0 or fresh:
                coach.reset()
            setattr(obj, key, value)
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
    parser.add_argument("--forked", action="store_true",
                        help="run each value in its own child process — "
                             "required for compile-time knobs (hyper.steps, "
                             "hyper.noise_scale, base.latdim, "
                             "data.missing_modalities, train.batch, ...); "
                             "dynamic hypers and train.lr/train.reg sweep "
                             "recompile-free WITHOUT this flag; params may "
                             "be section-qualified")
    parser.add_argument("--set", action="append", default=[],
                        metavar="SEC.KEY=VAL",
                        help="config override applied after load (repeatable)")
    parser.add_argument("--run-once", action="store_true",
                        help="internal (forked children): train once with the "
                             "given --set overrides and write the best "
                             "metrics to --out as JSON")
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--out", default="sweep_results.json")
    parser.add_argument("--data-root", default=None)
    args = parser.parse_args(argv)

    if args.forked and args.plan:
        raise SystemExit(
            "--plan is not supported with --forked (the plan's reused-Coach "
            "coordinate descent is exactly what forking avoids); run forked "
            "sweeps one param at a time and carry winners via --set"
        )

    config = load_config(args.config)
    for override in args.set:
        qual, _, raw = override.partition("=")
        obj, key = _resolve(config, qual)
        setattr(obj, key, _cast(type(getattr(obj, key)), raw))

    # Validate the requested params BEFORE any device/data work: sweeping a
    # compile-time constant on a reused Coach would silently keep the old
    # value, so refuse it up front (forked children recompile per value and
    # may sweep anything).
    plan_legs = []
    if args.plan:
        for leg in args.plan.split(";"):
            param, _, raw = leg.partition("=")
            plan_legs.append((param.strip(), raw))
    if not args.forked and not args.run_once:
        for param in [p for p, _ in plan_legs] or [args.param]:
            if not _is_dynamic_safe(config, param):
                raise SystemExit(
                    f"--param {param} is a compile-time constant; sweeping it "
                    f"on a reused Coach would silently keep the old value. "
                    f"Use --forked (one child process per value; dynamic-safe "
                    f"params: {sorted(DYNAMIC_SAFE)})."
                )

    if args.forked and not args.run_once:
        # Parent: spawn one child per value, serially (children share one
        # accelerator). No jax backend is initialized in this process.
        swept_field = _resolve(config, args.param)
        for override in args.set:
            if _resolve(config, override.partition("=")[0]) == swept_field:
                raise SystemExit(
                    f"--set names the swept param {args.param!r}; drop the "
                    f"override (the sweep supplies its values)"
                )
        values = _cast_values(config, args.param, args.values)
        results = []
        for value in values:
            with tempfile.NamedTemporaryFile(
                mode="r", suffix=".json", delete=False
            ) as tmp:
                child_out = tmp.name
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "-c", args.config, "--run-once", "--epochs", str(args.epochs),
                "--out", child_out,
            ]
            for override in args.set:
                cmd += ["--set", override]
            # the swept value goes LAST: the child applies --set in order,
            # so a user override naming the swept param must not win
            cmd += ["--set", f"{args.param}={value}"]
            if args.data_root:
                cmd += ["--data-root", args.data_root]
            print(f"🔁 forked sweep {args.param} = {value}", flush=True)
            proc = subprocess.run(cmd)
            if proc.returncode != 0:
                print(f"child for {args.param}={value} failed "
                      f"(rc={proc.returncode})", file=sys.stderr)
                results.append({args.param: value, "error": proc.returncode})
            else:
                with open(child_out) as fh:
                    results.append({args.param: value, **json.load(fh)})
            os.unlink(child_out)
            with open(args.out, "w") as fh:  # survive interruption
                json.dump({"config": args.config, "param": args.param,
                           "epochs": args.epochs, "forked": True,
                           "set": args.set, "results": results}, fh, indent=2)
        print(json.dumps(results))
        return 0

    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.train.coach import Coach
    from diffmm_tpu.utils.logging import Log

    host = load_host_data(config, data_root=args.data_root)
    log = Log("sweep", config.data.name)
    coach = Coach(config, host, log=log)

    if args.run_once:
        best = coach.run(epochs=args.epochs)
        with open(args.out, "w") as fh:
            json.dump(best, fh)
        print(json.dumps(best))
        return 0

    if args.plan:
        legs = [(param, _cast_values(config, param, raw))
                for param, raw in plan_legs]
        report = {"config": args.config, "plan": args.plan,
                  "epochs": args.epochs, "set": args.set,
                  "legs": [], "incumbent": {}}
        for li, (param, values) in enumerate(legs):
            rows = _sweep_one(coach, config, log, param, values,
                              args.epochs, fresh=li > 0)
            best = max(rows, key=lambda r: r["Recall"])
            # every leg fixes its best-Recall winner before the next —
            # including seed (bare "seed" resolves to base.seed): a seed leg
            # previously left config at the LAST swept value, so later legs
            # ran at an arbitrary seed excluded from the incumbent
            obj, key = _resolve(config, param)
            setattr(obj, key, best[param])
            report["incumbent"][param] = best[param]
            report["legs"].append({"param": param, "results": rows,
                                   "winner": best})
            log.info(f"🏁 leg {param}: winner {best[param]} "
                     f"(Recall {best['Recall']:.5f})")
            with open(args.out, "w") as fh:  # survive interruption
                json.dump(report, fh, indent=2)
        print(json.dumps(report["incumbent"]))
        return 0

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
                    # provenance: reruns need the full configuration, not
                    # just the swept param (forked mode already records it)
                    "set": args.set,
                    "results": results,
                },
                fh,
                indent=2,
            )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
