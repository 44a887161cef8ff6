"""Decompose the joint-step time into measured components.

DESIGN.md's roofline argues the dense-form joint step is adjacency-traffic
bound with a VPU-work remainder; this tool turns that narrative into
numbers by timing jitted sub-programs of the SAME step on the live device:

  * ``spmm_fwd`` / ``spmm_bwd`` — one propagation pass over the (U, I)
    dense adjacency (the unit the roofline counts ~26 of per step)
  * ``gcn_forward`` — the full multi-modal forward (10 passes)
  * ``joint_nocl`` — value_and_grad of BPR + L2 only (no CL terms)
  * ``joint_step`` — the real training step (forward + CL + grad + Adam)

  python tools/joint_profile.py -c conf/tiktok_tuned.toml --reps 100

Prints one JSON line; record the breakdown in DESIGN.md. Run on the real
TPU (single chip) — CPU timings are meaningless for this purpose.
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


def timeit(fn, reps: int, warmup: int = 3) -> float:
    """Median dispatched seconds of ``fn()`` (block_until_ready inside)."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", "-c", default="conf/tiktok_tuned.toml")
    p.add_argument("--reps", type=int, default=100)
    p.add_argument("--data-root", default=None)
    args = p.parse_args(argv)

    from diffmm_tpu.config import load_config
    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.models.gcn import gcn_mm
    from diffmm_tpu.ops.graph import spmm_bi
    from diffmm_tpu.ops.losses import bpr_loss, l2_reg_loss
    from diffmm_tpu.train.coach import Coach

    config = load_config(args.config)
    host = load_host_data(config, data_root=args.data_root)
    coach = Coach(config, host)
    coach.train_epoch(0)  # builds modal adjacencies; pays the big compiles

    data = coach.data
    hp = coach._hp()
    params = coach.gcn_params
    opt_state = coach.gcn_opt_state
    adj = data.adj
    modal_adjs = tuple(coach.modal_adjs)
    batch = config.train.batch
    d = config.base.latdim

    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.integers(0, host.user_num, batch, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, host.item_num, batch, dtype=np.int32))
    neg = jnp.asarray(rng.integers(0, host.item_num, batch, dtype=np.int32))
    key = jax.random.PRNGKey(7)
    lr = jnp.float32(config.train.lr)

    xu = jnp.asarray(rng.standard_normal((host.user_num, d), dtype=np.float32))
    xi = jnp.asarray(rng.standard_normal((host.item_num, d), dtype=np.float32))

    spmm_fwd = jax.jit(lambda a, b: spmm_bi(adj, a, b))
    # squared sum: a linear functional's grad is input-independent and XLA
    # constant-folds the whole backward away
    spmm_grad = jax.jit(
        jax.grad(
            lambda a, b: sum(jnp.sum(y * y) for y in spmm_bi(adj, a, b)), (0, 1)
        )
    )

    if not coach.dense_graphs:
        raise SystemExit("joint_profile targets the dense MXU form")

    def nocl_loss_dense(prm):
        out = gcn_mm(
            prm, adj, list(modal_adjs), data.raw_feats,
            modal_adj_weight=hp["modal_adj_weight"],
            residual_weight=hp["residual_weight"],
        )
        u_e = out.u_final.take(users, axis=0)
        rec = bpr_loss(u_e, out.i_final.take(pos, axis=0), out.i_final.take(neg, axis=0))
        return rec + l2_reg_loss(hp["reg"], [prm["u_embs"], prm["i_embs"]])

    joint_nocl = jax.jit(jax.value_and_grad(nocl_loss_dense))

    gcn_fwd = lambda: coach.steps.gcn_forward(
        params, adj, modal_adjs, data.raw_feats, hp
    )
    joint = lambda: coach.steps.joint_step(
        params, opt_state, adj, modal_adjs, data.raw_feats,
        users, pos, neg, key, lr, hp,
    )

    r = args.reps
    res = {
        "config": args.config,
        "backend": jax.default_backend(),
        "dense_store": config.train.dense_store,
        "spmm_fwd_ms": round(timeit(lambda: spmm_fwd(xu, xi), r) * 1e3, 3),
        "spmm_bwd_ms": round(timeit(lambda: spmm_grad(xu, xi), r) * 1e3, 3),
        "gcn_forward_ms": round(timeit(gcn_fwd, r) * 1e3, 3),
        "joint_nocl_ms": round(timeit(lambda: joint_nocl(params), r) * 1e3, 3),
        "joint_step_ms": round(timeit(joint, r) * 1e3, 3),
    }
    # derived: what CL + optimizer add on top of the plain BPR grad step
    res["cl_plus_adam_ms"] = round(res["joint_step_ms"] - res["joint_nocl_ms"], 3)
    adj_bytes = host.user_num * host.item_num * coach.dense_store_bytes_per_cell
    res["adj_pass_roofline_ms"] = round(adj_bytes / 819e9 * 1e3, 3)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
