"""A/B probe: per-modality modal reductions vs one stacked kernel call.

Round-5 attribution (`sweeps/joint_profile_r5_sparse.json`) pinned the
sparse joint block's cost on per-edge index machinery distributed across
~26 sub-millisecond pass-pairs — i.e. per-CALL fixed cost, not any single
op. The rebuilt modality graphs all share the main graph's STATIC
user-major edge layout (ops/topk.py: positions indptr[u]:indptr[u+1] hold
user u's top-degree(u) items for EVERY modality), which opens two
batched forms that pay that fixed cost once instead of M times:

  * user direction: identical row ids across modalities -> ONE planned
    reduction at feature width M*d (the one-hot chunk matmuls are reused
    across the stacked width; FLOPs triple but they ride the MXU).
  * item direction: per-modality sorted item-major layouts concatenated
    with +m*I offsets stay globally sorted -> ONE rank-space reduction of
    M*nnz edges into M*I segments (rank machinery amortized via one
    hoisted aux).

This tool measures both forms against the separate per-modality calls on
the live chip with the amortized-scan harness (tools/joint_profile.py
methodology — the tunnel memoizes and per-call timing is meaningless).

  python tools/stacked_probe.py -c conf/tiktok_tuned.toml --set train.graph_form=sparse

Prints one JSON line; the go/no-go record for restructuring gcn_mm.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from joint_profile import make_looped, median_time, probe_scalar  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", "-c", default="conf/tiktok_tuned.toml")
    p.add_argument("--inner", type=int, default=32)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--data-root", default=None)
    p.add_argument("--out", default=None)
    p.add_argument(
        "--set", action="append", default=[], dest="overrides",
        metavar="SECTION.KEY=VALUE",
    )
    args = p.parse_args(argv)

    from diffmm_tpu.config import apply_overrides, load_config
    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.ops.pallas.segsum import (
        make_rank_aux,
        make_ranked_plan,
        make_segsum_plan,
        ranked_segment_sum,
        sorted_segment_sum_planned,
    )
    from diffmm_tpu.train.coach import Coach

    config = load_config(args.config)
    if args.overrides:
        apply_overrides(config, args.overrides)
    host = load_host_data(config, data_root=args.data_root)
    coach = Coach(config, host)
    coach.train_epoch(0)  # builds modal adjacencies + hoisted rank aux

    U, I, d = host.user_num, host.item_num, config.base.latdim
    modal_adjs = tuple(coach.modal_adjs)
    M = len(modal_adjs)
    nnz = modal_adjs[0].nnz
    user_plan = coach.segsum_plans[0]
    item_plan = coach.modal_item_plan
    if user_plan is None or item_plan is None:
        print("probe needs the sparse form with MXU plans", file=sys.stderr)
        return 1

    rng = np.random.default_rng(0)
    # per-modality item/user message tables (values irrelevant to timing)
    z_i = [jnp.asarray(rng.standard_normal((I, d), dtype=np.float32))
           for _ in range(M)]
    z_u = [jnp.asarray(rng.standard_normal((U, d), dtype=np.float32))
           for _ in range(M)]

    rows = modal_adjs[0].ui_rows  # identical static layout across modalities
    cols = [a.ui_cols for a in modal_adjs]
    iu_rows = [a.ui_cols.take(a.iu_perm) for a in modal_adjs]  # sorted
    iu_cols = [a.ui_rows.take(a.iu_perm) for a in modal_adjs]

    # stacked user direction: one call at width M*d, same static rows
    rows_host = np.asarray(rows)
    plan_wide = make_segsum_plan(rows_host, U, d=M * d,
                                 chunk=user_plan.chunk)
    # stacked item direction: +m*I offsets keep global sortedness; pad
    # sentinels (== I) land on the NEXT block's segment 0 where their
    # zero message rows contribute nothing (last block's pads == M*I =
    # the global sentinel), so ascending order survives the concat
    ids_all = jnp.concatenate(
        [(r + m * I).astype(jnp.int32) for m, r in enumerate(iu_rows)]
    )
    plan_all = make_ranked_plan(M * nnz, d, chunk=item_plan.chunk)
    aux_all = make_rank_aux(ids_all, M * I)
    aux_m = [a.rank_aux for a in modal_adjs]

    K, R = args.inner, args.reps
    trivial = jax.jit(lambda x: x + 1.0)
    dispatch_s = median_time(lambda i: trivial(jnp.float32(i)),
                             reps=max(R, 10))

    def amortized_ms(body) -> float:
        t = median_time(make_looped(body, K), reps=R)
        return (t - dispatch_s) / K * 1e3

    def user_sep(c):
        outs = [
            sorted_segment_sum_planned(
                z.take(cc, axis=0) + c, rows, U, user_plan)
            for z, cc in zip(z_i, cols)
        ]
        return probe_scalar(outs)

    def user_stacked(c):
        msgs = jnp.concatenate(
            [z.take(cc, axis=0) for z, cc in zip(z_i, cols)], axis=1) + c
        return probe_scalar(
            sorted_segment_sum_planned(msgs, rows, U, plan_wide))

    def item_sep(c):
        outs = [
            ranked_segment_sum(
                z.take(cc, axis=0) + c, r, I, item_plan, aux=a)
            for z, cc, r, a in zip(z_u, iu_cols, iu_rows, aux_m)
        ]
        return probe_scalar(outs)

    def item_stacked(c):
        msgs = jnp.concatenate(
            [z.take(cc, axis=0) for z, cc in zip(z_u, iu_cols)]) + c
        return probe_scalar(
            ranked_segment_sum(msgs, ids_all, M * I, plan_all, aux=aux_all))

    result = {
        "config": args.config,
        "backend": jax.default_backend(),
        "n_modal": M,
        "nnz": int(nnz),
        "d": d,
        "inner_iters": K,
        "dispatch_overhead_ms": round(dispatch_s * 1e3, 3),
        "user_sep_ms": round(amortized_ms(user_sep), 3),
        "user_stacked_ms": round(amortized_ms(user_stacked), 3),
        "item_sep_ms": round(amortized_ms(item_sep), 3),
        "item_stacked_ms": round(amortized_ms(item_stacked), 3),
        "plan_wide_pieces": len(plan_wide.pieces) if plan_wide else None,
        "plan_all_pieces": len(plan_all.pieces) if plan_all else None,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps({"note": "stacked-modality reduction A/B "
                                "(tools/stacked_probe.py)",
                                "profile": result}, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
