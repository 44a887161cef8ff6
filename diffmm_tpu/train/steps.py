"""Jitted per-batch step functions for the three training phases.

The reference epoch (reference `Main.py:136-388`, SURVEY.md §3.2) becomes
three compiled programs, all static-shape:

  * Phase 1 — ``diffusion_step``: train every modality denoiser on one block
    of dense user rows (reference `Main.py:144-192`). The per-modality losses
    are normalized by the *detached* sum before backward
    (`Main.py:174-185`) — here via ``stop_gradient``.
  * Phase 2 — ``rebuild_step``: reverse-diffuse one block of user rows per
    modality into value-sorted top-``k_max`` index tables; ``rebuild_epoch``
    stacks the identity-ordered blocks and builds each modality's static
    (nnz,) CSR edge buffer with one gather — each user keeps its top
    ``degree`` items (reference `Main.py:195-253`).
  * Phase 3 — ``joint_step``: full-graph multi-modal GCN forward + BPR + L2 +
    cross-layer CL + cross-modal CL, one Adam step on the main model
    (reference `Main.py:291-377`).

All *scalar* hyperparameters (CL temps/rates, noise_degree, sim_weight, reg,
fusion weights) are traced through an ``hp`` dict the Coach rebuilds from
config each epoch — LR schedules, sweeps, and even mid-run hyper changes
never retrace. Only structural knobs (cl_method, diffusion steps, layer
dims, graph form) are compile-time constants.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from diffmm_tpu.config import Config
from diffmm_tpu.data.membership import gather_rows
from diffmm_tpu.diffusion.gaussian import generate_view, training_losses
from diffmm_tpu.diffusion.schedule import DiffusionSchedule
from diffmm_tpu.models.gcn import gcn_mm, project_features
from diffmm_tpu.ops.graph import BiAdj, spmm_bi
from diffmm_tpu.ops.losses import bpr_loss, info_nce, l2_normalize, l2_reg_loss
from diffmm_tpu.ops.topk import csr_gather_build, topk_table
from diffmm_tpu.train.optim import adam_update, make_adam


class TrainSteps(NamedTuple):
    # per-block steps (one dispatch per block)
    diffusion_step: Any
    rebuild_step: Any
    joint_step: Any
    gcn_forward: Any
    # whole-phase steps (lax.scan over blocks — one dispatch per phase)
    diffusion_epoch: Any
    rebuild_epoch: Any
    joint_epoch: Any


def make_train_steps(
    config: Config,
    schedule: DiffusionSchedule,
    n_modal: int,
    k_max: int,
    segsum_plans: tuple = (None, None),
    rebuild_plan=None,
    modal_item_plan=None,
    item_num: int | None = None,
    modal_wide_plan=None,
) -> TrainSteps:
    """``segsum_plans = (user_dir_plan, item_dir_plan)``: host-made plans for
    the MXU sorted-segment-sum on the sparse graph form (None = XLA scatter).
    The user direction applies to every graph (rebuilt modality graphs share
    the train rows); the static item plan only to the main graph.
    ``modal_item_plan``: rank-space plan covering the rebuilt modality
    graphs' DYNAMIC item layout (exact by pigeonhole — see
    ops/pallas/segsum.py::RankedSegsumPlan).

    ``rebuild_plan`` (ops.topk.RebuildBucketPlan, from
    ``train.rebuild_order="degree"``): static degree-descending bucket
    layout for the phase-2 rebuild — per-bucket top-k widths instead of one
    global ``k_max``. None keeps the identity order."""
    hyper = config.hyper
    train_cfg = config.train
    if item_num is None:
        # static catalog size for the membership-store row materialization
        # (config.data.item_num is filled by the loader before Coach builds
        # the steps); explicit arg for direct/test construction
        item_num = config.data.item_num
    assert item_num > 0, "make_train_steps needs the catalog size"
    if train_cfg.rebuild_topk not in ("approx", "exact"):
        raise ValueError(
            f"train.rebuild_topk must be approx|exact, got "
            f"{train_cfg.rebuild_topk!r}"
        )
    tx = make_adam()
    main_segsum = segsum_plans
    segsum_compute = train_cfg.segsum_compute
    if segsum_compute not in ("f32", "bf16"):
        raise ValueError(
            f"train.segsum_compute must be f32|bf16, got {segsum_compute!r}"
        )
    # KNN-ablation modality graphs have a user_num*knn_topk edge layout, NOT
    # the train layout the plans were made for — slicing with train-layout
    # boundaries would silently drop edges. The item direction takes the
    # rank-space plan (exact on the DYNAMIC rebuilt item layout — see
    # coach._ranked_gate); None keeps the XLA scatter.
    modal_segsum = (
        (None, None) if hyper.use_knn_adj
        else (segsum_plans[0], modal_item_plan)
    )
    # the stacked modal path shares the rebuilt graphs' train-row layout —
    # same exclusion as the plans above; also needs the rank-space item
    # plan for its backward reductions
    if hyper.use_knn_adj or modal_item_plan is None:
        modal_wide_plan = None

    # Denoiser forward for the NO-GRAD reverse-sampling path (phase 2). The
    # fused Pallas kernel has no VJP, so the diffusion-training path always
    # uses the XLA forward (autodiff'd); reverse sampling may use Pallas.
    from diffmm_tpu.models.denoise import denoise_forward

    # Measured on v5e/tiktok: the fused kernel matches XLA's fusion of this
    # MLP within noise (~0.78 vs ~0.76 s/epoch) — XLA already keeps the
    # hidden activation fused here — so "auto" resolves to XLA and the
    # kernel stays opt-in for larger catalogs / future shapes.
    sample_apply = denoise_forward
    impl = config.base.denoiser_impl
    if impl == "pallas":
        if len(config.base.denoise_dims()) != 1:
            raise ValueError("denoiser_impl='pallas' needs a single hidden layer")
        if jax.default_backend() in ("cpu",):
            raise ValueError(
                "denoiser_impl='pallas' needs a TPU backend (the Mosaic "
                "kernel does not lower on CPU; tests use interpret mode)"
            )
        from diffmm_tpu.ops.pallas.denoise_mlp import denoise_forward_pallas

        sample_apply = denoise_forward_pallas
    elif impl not in ("auto", "xla"):
        raise ValueError(
            f"base.denoiser_impl must be auto|xla|pallas, got {impl!r}"
        )

    # train.rebuild_compute="bf16": run the no-grad reverse-sampling MLPs on
    # the MXU's bf16 path (f32 accumulation). Params are cast ONCE per
    # rebuild block (outside the timestep scan); the forward casts its
    # activations. Training (phase 1) is untouched — it autodiffs in f32.
    rebuild_compute = train_cfg.rebuild_compute
    if rebuild_compute == "bf16":
        if impl == "pallas":
            raise ValueError(
                "train.rebuild_compute='bf16' uses the XLA denoiser forward; "
                "drop base.denoiser_impl='pallas' (the Mosaic kernel is f32)"
            )

        def rebuild_apply(params, x_t, t, modal_feat):
            return denoise_forward(
                params, x_t, t, modal_feat, compute_dtype=jnp.bfloat16
            ).astype(jnp.float32)

        def cast_rebuild_params(p):
            return jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

    elif rebuild_compute == "f32":
        rebuild_apply = sample_apply
        cast_rebuild_params = lambda p: p
    else:
        raise ValueError(
            f"train.rebuild_compute must be f32|bf16, got {rebuild_compute!r}"
        )

    # ---------------------------------------------------------------- phase 1
    def _modal_losses(dn_params_list, gcn_params, raw_feats, x0, weights, key, hp):
        feats = [
            jax.lax.stop_gradient(f) for f in project_features(gcn_params, raw_feats)
        ]
        i_embs = jax.lax.stop_gradient(gcn_params["i_embs"])
        keys = jax.random.split(key, n_modal)
        w_sum = jnp.maximum(jnp.sum(weights), 1.0)
        losses = []
        for m in range(n_modal):
            per_row = training_losses(
                schedule,
                dn_params_list[m],
                x0,
                i_embs,
                feats[m],
                keys[m],
                sim_weight=hp["sim_weight"],
                reg=hp["reg"],
            )
            losses.append(jnp.sum(per_row * weights) / w_sum)
        return losses

    def _diffusion_block(dn_params_list, dn_opt_states, gcn_params, raw_feats,
                         train_store, users, weights, key, lr, hp):
        """One optimizer step for every denoiser on one user-row block.

        ``users`` selects rows of the train membership store — a gather
        from the dense int8 matrix, or a per-block CSR materialization on
        the O(nnz) store (data/membership.py; bit-identical rows — the
        reference streams pre-materialized dense f32 rows through a
        DataLoader, `DataHandler.py:128,211-228`). ``weights`` is the (B,)
        validity mask for padded rows — the masked mean reproduces the
        reference's plain mean over its (possibly short) final batch.
        """
        x0 = gather_rows(train_store, users, item_num)

        def loss_fn(dn_list):
            losses = _modal_losses(dn_list, gcn_params, raw_feats, x0, weights, key, hp)
            total = jax.lax.stop_gradient(sum(losses))
            # reference Main.py:174-185: sum of losses / detached total
            return sum(losses) / total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(dn_params_list)
        new_params, new_states = [], []
        for m in range(n_modal):
            p, s = adam_update(tx, grads[m], dn_opt_states[m], dn_params_list[m], lr)
            new_params.append(p)
            new_states.append(s)
        return new_params, new_states, jnp.stack(losses)

    diffusion_step = jax.jit(_diffusion_block)

    # train.donate_buffers: the epoch programs consume-and-replace their
    # state (params + Adam moments), so those inputs are donated — XLA
    # aliases them to the matching outputs instead of holding both copies
    # across the dispatch. Nested use (the fused epoch scan traces these
    # same callables) silently ignores the annotation; the fused program
    # carries its own donation list.
    _donate = (0, 1) if train_cfg.donate_buffers else ()

    def _diffusion_epoch(dn_params_list, dn_opt_states, gcn_params, raw_feats,
                        train_store, users_blocks, weight_blocks, keys, lr, hp):
        """All diffusion blocks of one epoch as a single compiled scan —
        one dispatch instead of one per block. ``users_blocks`` /
        ``weight_blocks`` / ``keys`` carry a leading (n_blocks,) dim.

        Also folds the reference's loss-accounting quirk
        (`Main.py:174-185`): the per-modality accumulator is divided by each
        block's detached total loss inside the loop.
        """

        def body(carry, xs):
            dn, states, acc = carry
            users, weights, key = xs
            dn, states, losses = _diffusion_block(
                dn, states, gcn_params, raw_feats, train_store, users, weights,
                key, lr, hp,
            )
            acc = (acc + losses) / jnp.maximum(jnp.sum(losses), 1e-12)
            return (dn, states, acc), None

        acc0 = jnp.zeros((n_modal,), dtype=jnp.float32)
        (dn, states, acc), _ = jax.lax.scan(
            body,
            (dn_params_list, dn_opt_states, acc0),
            (users_blocks, weight_blocks, keys),
        )
        return dn, states, acc

    diffusion_epoch = jax.jit(_diffusion_epoch, donate_argnums=_donate)

    # ---------------------------------------------------------------- phase 2
    def _rebuild_block_tables(dn_params_list, train_store, users, key,
                              sampling_step, k_table=None):
        """Reverse-diffuse a user block per modality -> value-sorted
        (B, k_table) top-index tables (one per modality; default width =
        the global ``k_max``)."""
        x0 = gather_rows(train_store, users, item_num)
        keys = jax.random.split(key, n_modal)
        tables = []
        for m in range(n_modal):
            denoised = generate_view(
                schedule,
                cast_rebuild_params(dn_params_list[m]),
                x0,
                sampling_step=sampling_step,
                key=keys[m],
                denoise_apply=rebuild_apply,
            )
            tables.append(
                topk_table(
                    denoised,
                    k_table if k_table is not None else k_max,
                    train_cfg.rebuild_topk,
                )
            )
        return tuple(tables)

    rebuild_step = jax.jit(_rebuild_block_tables, static_argnames=("k_table",))

    # Bucketed rebuild (train.rebuild_order="degree"): per-bucket static
    # top-k widths. Identity order is the single-bucket special case below.
    plan_widths = rebuild_plan.widths if rebuild_plan is not None else ()
    plan_starts = rebuild_plan.row_starts if rebuild_plan is not None else ()

    @jax.jit
    def rebuild_epoch(dn_params_list, train_store, users_blocks, keys,
                      sampling_step, row_of_pos, lane_of_pos, pad_mask,
                      item_num):
        """All rebuild blocks of one epoch, one scan per top-k width.

        Identity order (``rebuild_plan=None``): coach passes ``_pad_blocks``
        indices, one scan over all blocks, and the stacked (U_pad, k_max)
        table builds each modality's CSR edge buffer with ONE static gather
        (``csr_gather_build``) — no scatter. The former per-block masked
        scatter (``topk_scatter_edges``, kept as the parity oracle)
        measured 2.9 ms x 30 blocks/epoch on v5e; the gather is sub-ms.

        Degree order: ``users_blocks`` is a per-bucket tuple in the plan's
        degree-descending block order; each bucket scans at its own static
        width (the dominant win — top-k at (1024, 6710) costs 2.8 ms at
        k=603 vs ~0.02 ms at k=4, and on power-law degrees only the leading
        bucket needs the global k_max). ``row_of_pos`` then maps CSR
        positions to degree-sort rows and the buffer build selects between
        the buckets' gathers on the static row ranges. ``keys`` stay one
        (n_total_blocks, 2) array consumed in block order, so the key
        stream is identical across graph forms. ``sampling_step`` is traced
        so hyperparameter sweeps don't retrace."""
        if rebuild_plan is None:
            bucket_blocks = (users_blocks,)
            widths = (k_max,)
            starts = (0,)
        else:
            bucket_blocks = tuple(users_blocks)
            widths = plan_widths
            starts = plan_starts

        bucket_tables = []  # [bucket][modality] -> (rows_b, k_b)
        ofs = 0
        for blocks_b, k_b in zip(bucket_blocks, widths):
            nb = blocks_b.shape[0]

            def body(_, xs, k_b=k_b):
                users, key = xs
                return None, _rebuild_block_tables(
                    dn_params_list, train_store, users, key, sampling_step,
                    k_table=k_b,
                )

            _, tabs = jax.lax.scan(
                body, None, (blocks_b, keys[ofs:ofs + nb])
            )
            ofs += nb
            bucket_tables.append(
                [tabs[m].reshape(-1, k_b) for m in range(n_modal)]
            )

        buffers = []
        for m in range(n_modal):
            if len(bucket_tables) == 1:
                buffers.append(
                    csr_gather_build(
                        bucket_tables[0][m], row_of_pos, lane_of_pos,
                        pad_mask, item_num,
                    )
                )
                continue
            edges = None
            for tab_m, k_b, start in zip(bucket_tables, widths, starts):
                tab = tab_m[m]
                local_row = jnp.clip(row_of_pos - start, 0, tab.shape[0] - 1)
                # in-bucket lanes are < k_b by construction (bucket width >=
                # its users' degrees); the clamp only covers OTHER buckets'
                # positions, which the select below masks out
                local_lane = jnp.minimum(lane_of_pos, k_b - 1)
                cand = tab[local_row, local_lane]
                edges = (
                    cand if edges is None
                    else jnp.where(row_of_pos >= start, cand, edges)
                )
            buffers.append(jnp.where(pad_mask, jnp.int32(item_num), edges))
        return buffers

    # ---------------------------------------------------------------- phase 3
    def _cross_layer_cl(id_u, id_i, adj: BiAdj, users, pos_items, key, hp):
        """3-layer noisy propagation + layer-0-vs-mean InfoNCE
        (reference `Main.py:314-334`). ``id_u/id_i`` are the first (pre-noise)
        propagation, reused from the GCN forward — the reference recomputes
        the identical `torch.sparse.mm` (`Main.py:319`)."""
        ju, ji = id_u, id_i
        acc_u = jnp.zeros_like(ju)
        acc_i = jnp.zeros_like(ji)
        layer0_u, layer0_i = ju, ji
        keys = jax.random.split(key, 6)
        for k in range(3):
            if k > 0:
                ju, ji = spmm_bi(adj, ju, ji, main_segsum, segsum_compute)
            noise_u = jax.random.uniform(keys[2 * k], ju.shape, dtype=ju.dtype)
            noise_i = jax.random.uniform(keys[2 * k + 1], ji.shape, dtype=ji.dtype)
            ju = ju + jnp.sign(ju) * l2_normalize(noise_u, axis=1) * hp["noise_degree"]
            ji = ji + jnp.sign(ji) * l2_normalize(noise_i, axis=1) * hp["noise_degree"]
            acc_u = acc_u + ju
            acc_i = acc_i + ji
            if k == 0:
                layer0_u, layer0_i = ju, ji
        mean_u, mean_i = acc_u / 3.0, acc_i / 3.0
        return (
            info_nce(mean_u, layer0_u, users, hp["cross_cl_temp"])
            + info_nce(mean_i, layer0_i, pos_items, hp["cross_cl_temp"])
        ) * hp["cross_cl_rate"]

    def _modal_cl(out, users, pos_items, hp):
        """Cross-modal CL per cl_method (reference `Main.py:339-368`).

        cl_method == 1: pairwise modality-vs-modality; else every modality
        against the final view (the toml comments invert this mapping — the
        code is authoritative, SURVEY.md §2.2)."""
        loss = 0.0
        if config.base.cl_method == 1:
            for a in range(n_modal):
                for b in range(a + 1, n_modal):
                    loss += (
                        info_nce(out.modal_u[a], out.modal_u[b], users, hp["modal_cl_temp"])
                        + info_nce(out.modal_i[a], out.modal_i[b], pos_items, hp["modal_cl_temp"])
                    ) * hp["modal_cl_rate"]
        else:
            for m in range(n_modal):
                loss += (
                    info_nce(out.u_final, out.modal_u[m], users, hp["modal_cl_temp"])
                    + info_nce(out.i_final, out.modal_i[m], pos_items, hp["modal_cl_temp"])
                ) * hp["modal_cl_rate"]
        return loss

    def _joint_block(gcn_params, opt_state, adj, modal_adjs, raw_feats,
                     users, pos_items, neg_items, key, lr, hp):
        def loss_fn(params):
            out = gcn_mm(
                params, adj, list(modal_adjs), raw_feats,
                modal_adj_weight=hp["modal_adj_weight"],
                residual_weight=hp["residual_weight"],
                main_segsum=main_segsum,
                modal_segsum=modal_segsum,
                segsum_compute=segsum_compute,
                modal_wide_plan=modal_wide_plan,
            )
            u_e = out.u_final.take(users, axis=0)
            pos_e = out.i_final.take(pos_items, axis=0)
            neg_e = out.i_final.take(neg_items, axis=0)
            rec = bpr_loss(u_e, pos_e, neg_e)
            reg = l2_reg_loss(hp["reg"], [params["u_embs"], params["i_embs"]])
            cl = _cross_layer_cl(out.id_u, out.id_i, adj, users, pos_items, key, hp)
            cl = cl + _modal_cl(out, users, pos_items, hp)
            total = rec + reg + cl
            return total, (rec, reg, cl)

        # Measured non-lever (DESIGN.md §6a): jax.checkpoint(loss_fn) here
        # INCREASES the sparse-form executable temps at 40000x20000 (5.52 vs
        # 4.93 GB) — one whole-loss remat block re-materializes the full
        # propagation chain during the backward, so the per-edge transients
        # it targets are all live again, plus the recompute buffers. The
        # transients also shard with the data axis on a mesh, which is where
        # that catalog scale runs anyway.
        (total, (rec, reg, cl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gcn_params
        )
        new_params, new_state = adam_update(tx, grads, opt_state, gcn_params, lr)
        metrics = jnp.stack([total, rec, reg, cl])
        return new_params, new_state, metrics

    joint_step = jax.jit(_joint_block)

    def _joint_epoch(gcn_params, opt_state, adj, modal_adjs, raw_feats,
                    users_blocks, pos_blocks, neg_blocks, keys, lr, hp):
        """All joint-training blocks of one epoch as a single compiled scan;
        returns the summed metric vector (Loss/BPR/reg/CL)."""

        def body(carry, xs):
            params, state, acc = carry
            users, pos, neg, key = xs
            params, state, metrics = _joint_block(
                params, state, adj, modal_adjs, raw_feats, users, pos, neg,
                key, lr, hp,
            )
            return (params, state, acc + metrics), None

        acc0 = jnp.zeros((4,), dtype=jnp.float32)
        (params, state, acc), _ = jax.lax.scan(
            body,
            (gcn_params, opt_state, acc0),
            (users_blocks, pos_blocks, neg_blocks, keys),
        )
        return params, state, acc

    joint_epoch = jax.jit(_joint_epoch, donate_argnums=_donate)

    # ------------------------------------------------------------------ eval
    @jax.jit
    def gcn_forward(gcn_params, adj, modal_adjs, raw_feats, hp):
        out = gcn_mm(
            gcn_params, adj, list(modal_adjs), raw_feats,
            modal_adj_weight=hp["modal_adj_weight"],
            residual_weight=hp["residual_weight"],
            main_segsum=main_segsum,
            modal_segsum=modal_segsum,
            segsum_compute=segsum_compute,
            modal_wide_plan=modal_wide_plan,
        )
        return out.u_final, out.i_final

    return TrainSteps(
        diffusion_step=diffusion_step,
        rebuild_step=rebuild_step,
        joint_step=joint_step,
        gcn_forward=gcn_forward,
        diffusion_epoch=diffusion_epoch,
        rebuild_epoch=rebuild_epoch,
        joint_epoch=joint_epoch,
    )


def make_epochs_fused(
    steps: TrainSteps,
    item_num: int,
    build_modal_adj,
    constrain_buf=None,
    constrain_blocks=None,
    eval_fn=None,
    donate: bool = True,
):
    """One compiled program for E consecutive training epochs.

    A ``lax.scan`` over epochs whose body is the full four-phase epoch
    (negative sampling -> diffusion -> rebuild -> adjacency build -> joint).
    The single-epoch path costs several dispatches per epoch (each a host->
    device round-trip, ~28 ms over this environment's remote-TPU tunnel)
    plus four tiny ``random.split`` dispatches; this amortizes all of it to
    one dispatch per E epochs.

    RNG parity with the single-epoch path is exact: the key advances inside
    the scan with the same split order Coach._next_key produces per epoch
    (negs, diffusion, rebuild, joint), and the host permutations arrive
    pre-drawn in the same per-epoch order — so a fused run consumes the
    key stream and the numpy stream identically (asserted by
    tests/test_fused_epochs.py), keeping checkpoints interchangeable.

    ``build_modal_adj(rows, cols)`` builds one modality adjacency in the
    run's graph form (closure over store dtype / mesh constraints);
    ``constrain_buf``/``constrain_blocks`` apply the mesh shardings the
    single-epoch path establishes with device_put between phases (here as
    in-program ``with_sharding_constraint``).

    ``eval_fn(g, modal_adjs, adj, raw_feats, train_store, hp, eval_inputs)``
    (optional) runs the full-catalog ranking eval in-program and returns
    the (3,) Recall/NDCG/Precision SUM vector. With it, the returned
    program takes per-epoch eval flags plus the eval block bundle,
    evaluates under ``lax.cond`` (non-eval epochs skip the compute), and
    tracks the best-Recall epoch's (gcn_params, edge buffers) in the carry
    — so a chunk can span eval boundaries (the reference's tstEpoch=1
    cadence included) and still reproduce the reference's best-model
    selection (`Main.py:71-78`)."""
    from diffmm_tpu.data.sampling import negative_sampling

    cbuf = constrain_buf or (lambda x: x)
    cblk = constrain_blocks or (lambda x: x)

    def _epoch_body(key, dn, dno, g, go, xs, invariants):
        (du, jp, lr) = xs
        (raw_feats, train_store, train_rows, train_cols, adj, weight_blocks,
         reb_users, hp, sampling_step, u_of_pos, lane_of_pos, pad_mask) = invariants
        nb_d = du.shape[0]
        # reb_users is a per-bucket tuple under rebuild_order="degree"
        nb_r = (
            sum(b.shape[0] for b in reb_users)
            if isinstance(reb_users, tuple)
            else reb_users.shape[0]
        )
        nb_j = jp.shape[0]
        # split order == Coach._next_key call order in train_epoch
        key, k_neg = jax.random.split(key)
        negs = negative_sampling(k_neg, train_rows, train_store, item_num)
        key, k_diff = jax.random.split(key)
        dn, dno, modal_acc = steps.diffusion_epoch(
            dn, dno, g, raw_feats, train_store, du, weight_blocks,
            jax.random.split(k_diff, nb_d), lr, hp,
        )
        key, k_reb = jax.random.split(key)
        bufs = steps.rebuild_epoch(
            dn, train_store, reb_users, jax.random.split(k_reb, nb_r),
            sampling_step, u_of_pos, lane_of_pos, pad_mask, item_num,
        )
        bufs = tuple(cbuf(b) for b in bufs)
        modal_adjs = tuple(build_modal_adj(train_rows, b) for b in bufs)
        users = cblk(train_rows.take(jp))
        pos = cblk(train_cols.take(jp))
        neg = cblk(negs.take(jp))
        key, k_joint = jax.random.split(key)
        g, go, joint_acc = steps.joint_epoch(
            g, go, adj, modal_adjs, raw_feats, users, pos, neg,
            jax.random.split(k_joint, nb_j), lr, hp,
        )
        return key, dn, dno, g, go, bufs, modal_adjs, modal_acc, joint_acc

    # args 1-5 are the training state the chunk consumes and replaces
    # (denoiser params/moments, GCN params/moments, edge buffers) — donated
    # so the chunk's state peak is one copy, not input+output. The in-carry
    # best-model tracking of the eval variant reuses gcn_params/bufs0 as the
    # best-state init; XLA copies where an alias can't serve both outputs.
    _donate_fused = (1, 2, 3, 4, 5) if donate else ()

    @functools.partial(jax.jit, donate_argnums=_donate_fused)
    def epochs_fused(
        key, dn_params, dn_opt_states, gcn_params, gcn_opt_state, bufs0,
        raw_feats, train_store, train_rows, train_cols, adj,
        diff_users, weight_blocks, reb_users, joint_perms,
        lrs, hp, sampling_step, u_of_pos, lane_of_pos, pad_mask,
    ):
        invariants = (raw_feats, train_store, train_rows, train_cols, adj,
                      weight_blocks, reb_users, hp, sampling_step,
                      u_of_pos, lane_of_pos, pad_mask)

        def body(carry, xs):
            key, dn, dno, g, go, _ = carry
            key, dn, dno, g, go, bufs, _, modal_acc, joint_acc = _epoch_body(
                key, dn, dno, g, go, xs, invariants
            )
            return (key, dn, dno, g, go, bufs), (modal_acc, joint_acc)

        init = (key, dn_params, dn_opt_states, gcn_params, gcn_opt_state, bufs0)
        (key, dn, dno, g, go, bufs), (modal_accs, joint_accs) = jax.lax.scan(
            body, init, (diff_users, joint_perms, lrs)
        )
        return key, dn, dno, g, go, bufs, modal_accs, joint_accs

    if eval_fn is None:
        return epochs_fused

    @functools.partial(jax.jit, donate_argnums=_donate_fused)
    def epochs_fused_eval(
        key, dn_params, dn_opt_states, gcn_params, gcn_opt_state, bufs0,
        raw_feats, train_store, train_rows, train_cols, adj,
        diff_users, weight_blocks, reb_users, joint_perms,
        lrs, eval_flags, eval_inputs, hp, sampling_step,
        u_of_pos, lane_of_pos, pad_mask,
    ):
        invariants = (raw_feats, train_store, train_rows, train_cols, adj,
                      weight_blocks, reb_users, hp, sampling_step,
                      u_of_pos, lane_of_pos, pad_mask)

        def body(carry, xs):
            key, dn, dno, g, go, _, best_recall, best_g, best_bufs = carry
            (du, jp, lr, do_eval) = xs
            key, dn, dno, g, go, bufs, modal_adjs, modal_acc, joint_acc = (
                _epoch_body(key, dn, dno, g, go, (du, jp, lr), invariants)
            )
            # replicated predicate: every device takes the same branch, so
            # the eval branch's collectives stay aligned under SPMD
            sums = jax.lax.cond(
                do_eval,
                lambda: eval_fn(g, modal_adjs, adj, raw_feats, train_store,
                                hp, eval_inputs),
                lambda: jnp.full((3,), jnp.nan, jnp.float32),
            )
            # best-Recall tracking in-carry (reference model selection,
            # Main.py:71-78): strictly-greater keeps the FIRST best epoch,
            # matching the host-side comparison in Coach.run
            is_best = do_eval & (sums[0] > best_recall)
            best_recall = jnp.where(is_best, sums[0], best_recall)
            best_g = jax.tree.map(
                lambda new, old: jnp.where(is_best, new, old), g, best_g
            )
            best_bufs = tuple(
                jnp.where(is_best, new, old)
                for new, old in zip(bufs, best_bufs)
            )
            carry = (key, dn, dno, g, go, bufs, best_recall, best_g, best_bufs)
            return carry, (modal_acc, joint_acc, sums)

        neg_inf = jnp.float32(-jnp.inf)
        init = (key, dn_params, dn_opt_states, gcn_params, gcn_opt_state,
                bufs0, neg_inf, gcn_params, bufs0)
        (key, dn, dno, g, go, bufs, best_recall, best_g, best_bufs), ys = (
            jax.lax.scan(
                body, init, (diff_users, joint_perms, lrs, eval_flags)
            )
        )
        modal_accs, joint_accs, eval_sums = ys
        return (key, dn, dno, g, go, bufs, modal_accs, joint_accs,
                eval_sums, best_recall, best_g, best_bufs)

    return epochs_fused_eval
