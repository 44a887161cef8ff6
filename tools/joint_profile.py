"""Decompose the joint-step time into measured components.

DESIGN.md's roofline argues the dense-form joint step is adjacency-traffic
plus-VPU bound; this tool turns that narrative into numbers by timing
jitted sub-programs of the SAME step on the live device:

  * ``spmm_fwd`` / ``spmm_bwd`` — one propagation pass over the (U, I)
    dense adjacency (the unit the roofline counts ~26 of per step)
  * ``gcn_forward`` — the full multi-modal forward (10 passes)
  * ``joint_nocl`` — value_and_grad of BPR + L2 only (no CL terms)
  * ``joint_step`` — the real training step (forward + CL + grad + Adam)

Methodology note (round 3): this environment dispatches every jitted call
through a remote-TPU tunnel with ~25-30 ms round-trip overhead — larger
than any of the timed programs — so per-call wall timing is meaningless.
Each sub-program is instead iterated K times INSIDE one jitted
``lax.scan`` whose body consumes a carried scalar (a 1e-30-scaled probe of
the previous iteration's output, so XLA cannot hoist the loop-invariant
body) and the whole-program time minus one measured dispatch is divided
by K. This is the same amortized regime as the real epoch, which runs all
58 train blocks in one scan program.

  python tools/joint_profile.py -c conf/tiktok_tuned.toml --inner 32

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


def median_time(fn, reps: int, warmup: int = 2) -> float:
    """Median wall seconds of ``fn(i)`` (block_until_ready inside).

    ``fn`` MUST vary its device inputs with the rep index ``i``: this
    environment's remote-TPU tunnel memoizes repeated executions of the
    same executable on the same argument buffers (observed: a 32-iteration
    training-step loop "completing" in 0.3 ms, below one dispatch), so
    identical calls time the cache, not the device."""
    for i in range(warmup):
        jax.block_until_ready(fn(-1 - i))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(i))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_looped(body, inner: int):
    """Jit ``inner`` iterations of ``body(carry) -> carry`` as one scan
    program. ``body`` must thread a data dependence through the carry so
    XLA cannot hoist it out of the loop; the rep index seeds the carry so
    no two outer reps present identical argument buffers."""

    @jax.jit
    def run(carry):
        def step(c, _):
            return body(c), None

        out, _ = jax.lax.scan(step, carry, None, length=inner)
        return out

    return lambda i: run(jnp.float32(i) * 1e-30)


def probe_scalar(tree) -> jax.Array:
    """A scalar data-dependent on ``tree``, scaled to numerical nothing —
    carried between scan iterations purely to defeat loop hoisting."""
    leaves = [jnp.sum(x) for x in jax.tree.leaves(tree) if jnp.issubdtype(
        jnp.asarray(x).dtype, jnp.floating)]
    return jnp.asarray(sum(leaves)) * 1e-30


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", "-c", default="conf/tiktok_tuned.toml")
    p.add_argument("--inner", type=int, default=32,
                   help="iterations inside each jitted scan program")
    p.add_argument("--reps", type=int, default=7,
                   help="outer repetitions (median taken)")
    p.add_argument("--data-root", default=None)
    p.add_argument(
        "--set", action="append", default=[], dest="overrides",
        metavar="SECTION.KEY=VALUE",
        help="config overrides, same spelling as the CLI/sweep/bench "
        "(e.g. --set train.graph_form=sparse)",
    )
    args = p.parse_args(argv)

    from diffmm_tpu.config import apply_overrides, load_config
    from diffmm_tpu.data.loader import load_host_data
    from diffmm_tpu.models.gcn import gcn_mm
    from diffmm_tpu.ops.graph import spmm_bi
    from diffmm_tpu.ops.losses import bpr_loss, l2_reg_loss
    from diffmm_tpu.train.coach import Coach

    config = load_config(args.config)
    if args.overrides:
        apply_overrides(config, args.overrides)
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

    # sparse form: main graph uses both direction plans; modality graphs use
    # the user-direction plan + the rank-space item plan (their item layout
    # re-sorts every epoch), EXCEPT under the KNN ablation whose
    # user_num*knn_topk edge layout none of the train-layout plans cover —
    # mirror steps.make_train_steps' wiring so the timed unit is the real one
    main_segsum = coach.segsum_plans
    modal_segsum = (
        (None, None) if config.hyper.use_knn_adj
        else (coach.segsum_plans[0], coach.modal_item_plan)
    )

    K, R = args.inner, args.reps

    # dispatch overhead: a trivial program, timed the plain way
    trivial = jax.jit(lambda x: x + 1.0)
    dispatch_s = median_time(lambda i: trivial(jnp.float32(i)), reps=max(R, 10))

    def amortized_ms(body) -> float:
        t = median_time(make_looped(body, K), reps=R)
        return (t - dispatch_s) / K * 1e3

    # one propagation pass, forward
    def spmm_body(c):
        u2, i2 = spmm_bi(adj, xu + c, xi + c, main_segsum)
        return probe_scalar((u2, i2))

    # one propagation pass, backward (squared-sum objective: a linear
    # functional's grad is input-independent and XLA folds it away)
    spmm_g = jax.grad(
        lambda a, b: sum(
            jnp.sum(y * y) for y in spmm_bi(adj, a, b, main_segsum)
        ),
        (0, 1),
    )

    def spmm_bwd_body(c):
        gu, gi = spmm_g(xu + c, xi + c)
        return probe_scalar((gu, gi))

    # sparse form only: the same pass on the XLA scatter path (no plans) and
    # on a modality-shaped graph (dynamic item layout -> user plan only),
    # isolating what the MXU segsum kernel buys per direction
    def spmm_scatter_body(c):
        u2, i2 = spmm_bi(adj, xu + c, xi + c, (None, None))
        return probe_scalar((u2, i2))

    spmm_scatter_g = jax.grad(
        lambda a, b: sum(
            jnp.sum(y * y) for y in spmm_bi(adj, a, b, (None, None))
        ),
        (0, 1),
    )

    def spmm_scatter_bwd_body(c):
        gu, gi = spmm_scatter_g(xu + c, xi + c)
        return probe_scalar((gu, gi))

    def spmm_modal_body(c):
        u2, i2 = spmm_bi(modal_adjs[0], xu + c, xi + c, modal_segsum)
        return probe_scalar((u2, i2))

    spmm_modal_g = jax.grad(
        lambda a, b: sum(
            jnp.sum(y * y)
            for y in spmm_bi(modal_adjs[0], a, b, modal_segsum)
        ),
        (0, 1),
    )

    def spmm_modal_bwd_body(c):
        gu, gi = spmm_modal_g(xu + c, xi + c)
        return probe_scalar((gu, gi))

    def fwd_body(c):
        prm = jax.tree.map(
            lambda x: x + c if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        out = coach.steps.gcn_forward(prm, adj, modal_adjs, data.raw_feats, hp)
        return probe_scalar(out)

    def nocl_loss_dense(prm):
        out = gcn_mm(
            prm, adj, list(modal_adjs), data.raw_feats,
            modal_adj_weight=hp["modal_adj_weight"],
            residual_weight=hp["residual_weight"],
            main_segsum=main_segsum,
            modal_segsum=modal_segsum,
        )
        u_e = out.u_final.take(users, axis=0)
        rec = bpr_loss(u_e, out.i_final.take(pos, axis=0), out.i_final.take(neg, axis=0))
        return rec + l2_reg_loss(hp["reg"], [prm["u_embs"], prm["i_embs"]])

    nocl_vg = jax.value_and_grad(nocl_loss_dense)

    def nocl_body(c):
        prm = jax.tree.map(
            lambda x: x + c if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        val, grads = nocl_vg(prm)
        return probe_scalar((val, grads))

    # the real step: params/opt_state thread through the carry naturally
    def joint_body(carry):
        prm, opt = carry
        prm2, opt2, _ = coach.steps.joint_step(
            prm, opt, adj, modal_adjs, data.raw_feats,
            users, pos, neg, key, lr, hp,
        )
        return (prm2, opt2)

    @jax.jit
    def joint_loop(carry, eps):
        prm, opt = carry
        prm = jax.tree.map(
            lambda x: x + eps if jnp.issubdtype(x.dtype, jnp.floating) else x,
            prm,
        )

        def step(c, _):
            return joint_body(c), None

        out, _ = jax.lax.scan(step, (prm, opt), None, length=K)
        return out

    t_joint = median_time(
        lambda i: joint_loop((params, opt_state), jnp.float32(i) * 1e-30),
        reps=R,
    )

    res = {
        "config": args.config,
        "backend": jax.default_backend(),
        "graph_form": "dense" if coach.dense_graphs else "sparse",
        "dense_store": config.train.dense_store,
        "inner_iters": K,
        "dispatch_overhead_ms": round(dispatch_s * 1e3, 3),
        "spmm_fwd_ms": round(amortized_ms(spmm_body), 3),
        "spmm_bwd_ms": round(amortized_ms(spmm_bwd_body), 3),
        "gcn_forward_ms": round(amortized_ms(fwd_body), 3),
        "joint_nocl_ms": round(amortized_ms(nocl_body), 3),
        "joint_step_ms": round((t_joint - dispatch_s) / K * 1e3, 3),
    }
    # derived: what CL + optimizer add on top of the plain BPR grad step
    res["cl_plus_adam_ms"] = round(res["joint_step_ms"] - res["joint_nocl_ms"], 3)
    if not coach.dense_graphs:
        res["spmm_scatter_fwd_ms"] = round(amortized_ms(spmm_scatter_body), 3)
        res["spmm_scatter_bwd_ms"] = round(
            amortized_ms(spmm_scatter_bwd_body), 3
        )
        res["spmm_modal_fwd_ms"] = round(amortized_ms(spmm_modal_body), 3)
        res["spmm_modal_bwd_ms"] = round(amortized_ms(spmm_modal_bwd_body), 3)
        # bandwidth roofline of ONE sparse pass: both directions move the
        # (nnz_pad, d) f32 message gather in + the reduced outputs out, plus
        # the (U+I, d) inputs — the minimum HBM traffic of the operator
        nnz_pad = int(adj.ui_rows.shape[0])
        pass_bytes = (
            2 * nnz_pad * d * 4  # two per-edge gathers (one per direction)
            + 2 * (host.user_num + host.item_num) * d * 4  # in + out
        )
        res["sparse_pass_roofline_ms"] = round(pass_bytes / 819e9 * 1e3, 3)
    else:
        adj_bytes = (
            host.user_num * host.item_num * coach.dense_store_bytes_per_cell
        )
        res["adj_pass_roofline_ms"] = round(adj_bytes / 819e9 * 1e3, 3)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
