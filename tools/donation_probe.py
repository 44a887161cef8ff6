"""Measure what train.donate_buffers saves: XLA memory analysis of the epoch
programs with donation on vs off.

AOT-lowers (never executes) ``diffusion_epoch`` and ``joint_epoch`` with the
exact argument templates Coach.train_epoch passes, compiles both variants,
and prints each executable's ``memory_analysis()`` — argument/output/temp/
alias bytes. The donation win is the alias bytes: every aliased input byte
is one byte the executable does NOT have to hold twice (input + output)
across the dispatch. The training state (params + both Adam moments) is the
only per-catalog-row allocation with three copies, so at web scale this is
the difference between ~6 and ~3 state copies resident at the phase boundary
(the denoiser in/out layers are item_num-wide: 2 * I * hidden params per
modality — reference `Model.py:142-156` sizes, our `models/denoise.py`).

Usage:
    python tools/donation_probe.py                      # tiktok scale
    python tools/donation_probe.py --scale 40000x20000  # synthetic U x I

Run on the TPU backend for HBM-meaningful numbers (compile only — safe to
run while nothing else holds the chip; it allocates the dataset but never
dispatches an epoch).
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _phase_args(coach):
    """Argument templates for the two donating phase programs, shaped
    exactly as Coach.train_epoch passes them (coach.py:544-639)."""
    from diffmm_tpu.train.coach import _pad_blocks

    cfg = coach.config
    host = coach.host
    data = coach.data
    batch = cfg.train.batch
    hp = coach._hp()
    lr = jnp.float32(cfg.train.lr)

    idx, valid = _pad_blocks(host.user_num, batch)
    nb_d = len(idx) // batch
    users_blocks = jnp.zeros((nb_d, batch), jnp.int32)
    weight_blocks = jnp.asarray(valid.astype(np.float32)).reshape(nb_d, batch)
    dkeys = jax.random.split(jax.random.PRNGKey(0), nb_d)
    diff_args = (
        coach.dn_params, coach.dn_opt_states, coach.gcn_params,
        data.raw_feats, data.train_store, users_blocks, weight_blocks,
        dkeys, lr, hp,
    )

    jidx, _ = _pad_blocks(host.nnz, batch)
    nb_j = len(jidx) // batch
    blk = jnp.zeros((nb_j, batch), jnp.int32)
    jkeys = jax.random.split(jax.random.PRNGKey(1), nb_j)
    # modality adjacencies: same form/shape as the rebuilt ones — the train
    # layout reused (edge ids are what the rebuild replaces, not the layout)
    modal_adjs = tuple(
        coach._make_adj(data.train_rows, data.train_cols)
        for _ in range(coach.n_modal)
    )
    joint_args = (
        coach.gcn_params, coach.gcn_opt_state, data.adj, modal_adjs,
        data.raw_feats, blk, blk, blk, jkeys, lr, hp,
    )
    return diff_args, joint_args


def _analyze(jitted, args) -> dict[str, float]:
    ma = jitted.lower(*args).compile().memory_analysis()
    fields = (
        "argument_size_in_bytes", "output_size_in_bytes",
        "temp_size_in_bytes", "alias_size_in_bytes",
    )
    out = {f: getattr(ma, f, None) for f in fields}
    # resident across the dispatch: arguments stay alive on the caller side,
    # outputs + temps are the executable's own; aliased bytes are counted in
    # both arguments and outputs but occupy one buffer
    if all(out[f] is not None for f in fields):
        out["resident_bytes"] = (
            out["argument_size_in_bytes"] + out["output_size_in_bytes"]
            + out["temp_size_in_bytes"] - out["alias_size_in_bytes"]
        )
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", default="conf/test.toml")
    p.add_argument("--scale", default=None, help="synthetic UxI instead of the config's dataset")
    p.add_argument(
        "--density", type=float, default=0.001,
        help="interaction density for --scale (default ~tiktok's 1e-3; the "
        "synthetic default 0.06 is unrealistically dense at large scale)",
    )
    p.add_argument("--data-root", default=None)
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="config overrides (sweep/CLI spelling), e.g. "
        "--set train.remat_joint=true --set train.graph_form=sparse",
    )
    args = p.parse_args(argv)

    from diffmm_tpu.config import apply_overrides, load_config
    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.train.coach import Coach

    config = load_config(args.config)
    if args.set:
        apply_overrides(config, args.set)
    if args.scale:
        from diffmm_tpu.data.synthetic import make_synthetic_host_data

        u, i = args.scale.lower().split("x")
        host = make_synthetic_host_data(
            config, user_num=int(u), item_num=int(i),
            density=args.density, seed=config.base.seed,
        )
    else:
        host = load_host_data(config, data_root=args.data_root)

    report = {"dataset": host.name, "users": host.user_num,
              "items": host.item_num, "device": str(jax.devices()[0]),
              "overrides": args.set}
    for donate in (True, False):
        cfg = copy.deepcopy(config)
        cfg.train.donate_buffers = donate
        coach = Coach(cfg, host)
        diff_args, joint_args = _phase_args(coach)
        key = "donate_on" if donate else "donate_off"
        report[key] = {
            "diffusion_epoch": _analyze(coach.steps.diffusion_epoch, diff_args),
            "joint_epoch": _analyze(coach.steps.joint_epoch, joint_args),
        }
        del coach, diff_args, joint_args

    for phase in ("diffusion_epoch", "joint_epoch"):
        on = report["donate_on"][phase]
        off = report["donate_off"][phase]
        if on.get("resident_bytes") and off.get("resident_bytes"):
            report.setdefault("savings_mb", {})[phase] = round(
                (off["resident_bytes"] - on["resident_bytes"]) / 1e6, 1
            )
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
