"""Coach: the training/eval driver.

Parity target: reference `Main.py:18-448` (class ``Coach``) — same three-phase
epoch structure, metric accounting, logging surface, and best tracking, with
every per-epoch compute path jitted and device-resident (the reference's host
hot loops — DOK negative sampling, Python edge building, Python metric loops;
SURVEY.md §3.2/§3.4 — are all replaced by compiled static-shape programs).
"""

from __future__ import annotations

import contextlib
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diffmm_tpu.config import Config
from diffmm_tpu.data.loader import EDGE_ALIGN, DeviceData, HostData, to_device
from diffmm_tpu.data.sampling import negative_sampling
from diffmm_tpu.diffusion.schedule import make_schedule
from diffmm_tpu.eval.ranking import dcg_table, make_eval_epoch
from diffmm_tpu.models.denoise import init_denoise_params
from diffmm_tpu.models.gcn import init_gcn_params
from diffmm_tpu.ops.graph import (
    BiAdj,
    build_bi_adj_device,
    build_dense_bi_adj_device,
)
from diffmm_tpu.parallel.sharding import (
    check_batch_divisibility,
    shard_batch,
    shard_blocks,
    shard_device_data,
)
from diffmm_tpu.train.optim import cosine_lr, make_adam
from diffmm_tpu.train.steps import make_train_steps
from diffmm_tpu.utils.logging import Log
from diffmm_tpu.utils.profiling import PhaseTimer

_build_adj_jit = partial(
    jax.jit,
    static_argnames=("user_num", "item_num", "rows_sorted", "with_rank_aux"),
)(build_bi_adj_device)
_build_dense_adj_jit = partial(
    jax.jit, static_argnames=("user_num", "item_num", "rows_sorted", "store_dtype")
)(build_dense_bi_adj_device)

# The dense MXU graph form is selected automatically while the interaction
# blocks for main + modality graphs fit an HBM budget at their storage
# width (int8 default = 1 B/cell; ops/graph.py DenseBiAdj); beyond it the
# segment-sum SpMM path is used.
# The budget is per device: catalog-sharding over the mesh's model axis
# splits every (U, I) block, so the budget scales with that axis.
# 4 GiB is the FALLBACK when the device exposes no memory stats (CPU, some
# virtual backends) — it was calibrated on a 16 GiB v5e, i.e. 1/4 of HBM,
# leaving the rest for params + Adam moments (3 catalog-row copies per
# denoiser), the (B, I) phase transients, and XLA workspace. Real devices
# derive the budget from their own limit via dense_graph_budget_bytes().
DENSE_GRAPH_BUDGET_BYTES = 4 << 30
# 0.25 -> 0.6 in round 5: the fraction now pairs with an explicit
# state-bytes subtraction (estimate_state_bytes) instead of absorbing the
# state implicitly; calibration in dense_graph_budget_bytes's docstring.
_DENSE_BUDGET_HBM_FRACTION = 0.6


def dense_graph_budget_bytes(device=None, state_bytes: int = 0) -> int:
    """Per-device HBM budget for the dense-form interaction blocks.

    Probes ``memory_stats()["bytes_limit"]`` of the default (or given)
    device, takes the calibrated fraction and subtracts the caller's
    estimate of the run's OTHER resident state (denoiser 3-copy Adam
    groups, GCN params, dense train store — :func:`estimate_state_bytes`),
    so "auto" stays honest across chip generations: a 32 GiB chip keeps
    the dense form longer, an 8 GiB one switches to sparse before it
    would OOM. Calibration (round 5): yelp scale (4.61 GiB blocks +
    ~2.3 GiB state) ran every phase + eval on a 16 GiB v5e; 0.6·limit −
    state admits it with a ≥35% transient margin, where the previous
    0.25·limit (no state term) refused a configuration measured 2.2×
    faster dense. memory_stats is optional in the JAX device API (None on
    CPU and on this environment's tunnel TPU backend) — absent or zero
    limits fall back to the 4 GiB constant, which the ``train.
    dense_budget_gb`` config knob overrides for operators who know their
    chip."""
    try:
        dev = device if device is not None else jax.devices()[0]
        stats = dev.memory_stats()
        limit = int((stats or {}).get("bytes_limit", 0))
    except Exception:
        limit = 0
    if limit <= 0:
        return DENSE_GRAPH_BUDGET_BYTES
    return max(0, int(limit * _DENSE_BUDGET_HBM_FRACTION) - state_bytes)


def estimate_state_bytes(
    n_modal: int, user_num: int, item_num: int, latdim: int,
    hidden: list, d_emb_size: int, feat_dims, param_bytes: int = 4,
) -> int:
    """Dominant resident state BESIDES the interaction blocks, for the
    auto dense/sparse decision: the denoiser catalog-wide in/out layers ×
    3 copies (params + both Adam moments) per modality, the GCN params ×
    3 copies, and the (U, I) int8 train store the dense form carries.
    Deliberately a lower bound — per-phase transients ride the
    (1 − fraction) margin of :func:`dense_graph_budget_bytes`."""
    h0, hl = int(hidden[0]), int(hidden[-1])
    denoise = (item_num + d_emb_size) * h0 + hl * item_num
    gcn = (user_num + item_num + int(sum(feat_dims))) * latdim
    return (
        n_modal * 3 * denoise * param_bytes
        + 3 * gcn * 4
        + user_num * item_num
    )


def resolve_dense_store(name: str) -> tuple:
    """``train.dense_store`` -> (storage dtype, packed HBM bytes/cell).

    The 0/1 dense blocks are exact in every option; narrower just moves
    fewer bytes per propagation pass (XLA fuses the ->bf16 convert into the
    matmul reads). int4 packs two cells per byte on TPU — dtype.itemsize
    reports the unpacked host view, hence the explicit table."""
    table = {
        "int8": (jnp.int8, 1.0),
        "bf16": (jnp.bfloat16, 2.0),
        "int4": (jnp.int4, 0.5),
    }
    if name not in table:
        raise ValueError(
            f"train.dense_store must be int8|bf16|int4, got {name!r}"
        )
    return table[name]


_INT4_JIT_ARGS_OK: bool | None = None


def int4_jit_args_supported() -> bool:
    """Whether this backend accepts s4 arrays as jit ARGUMENTS.

    int4 inside a jitted program lowers fine everywhere, but some
    runtimes (observed: the axon-tunnel TPU backend, 2026-08) have no
    native s4 transfer/shard path — `_array_shard_arg` re-enters jit to
    repack and dies with `RecursionError: Recursively calling jit`
    (committed or not; device_put doesn't help). The persistent dense
    blocks cross the jit boundary every phase call, so int4 storage needs
    this one-time (8, 8) probe; Coach falls back to int8 with a warning
    when it fails."""
    global _INT4_JIT_ARGS_OK
    if _INT4_JIT_ARGS_OK is None:
        try:
            probe = jnp.zeros((8, 8), jnp.int4)
            jax.jit(lambda a: a.astype(jnp.int8))(probe).block_until_ready()
            _INT4_JIT_ARGS_OK = True
        except RecursionError:
            _INT4_JIT_ARGS_OK = False
    return _INT4_JIT_ARGS_OK


def choose_graph_form(
    form: str, n_modal: int, user_num: int, item_num: int,
    model_parallel: int = 1, bytes_per_cell: int = 2,
    budget_bytes: int | None = None,
) -> bool:
    """True -> dense MXU form. ``form``: auto|dense|sparse (validated).
    ``bytes_per_cell``: dense-block storage width (1 for the int8 default,
    2 for bf16, 0.5 for packed int4 — narrower covers more catalog).
    ``budget_bytes``: per-device HBM budget for the blocks; None probes the
    device (:func:`dense_graph_budget_bytes` — tests pass simulated
    budgets)."""
    if form == "auto":
        if budget_bytes is None:
            budget_bytes = dense_graph_budget_bytes()
        bytes_needed = (n_modal + 1) * user_num * item_num * bytes_per_cell
        if bytes_per_cell < 2:
            # int8 storage: reserve for ONE transient bf16 operand copy in
            # case XLA materializes (rather than fuses) the convert at this
            # shape — fusion is a scheduling choice, not a contract, and
            # the temporary is reused across the (n_modal+1) graphs.
            bytes_needed += user_num * item_num * 2
        return bytes_needed <= budget_bytes * max(model_parallel, 1)
    if form in ("dense", "sparse"):
        return form == "dense"
    raise ValueError(f"train.graph_form must be auto|dense|sparse, got {form!r}")


def _pad_blocks(n: int, batch: int) -> tuple[np.ndarray, np.ndarray]:
    """Indices [0, n) padded to a multiple of ``batch`` + validity mask."""
    n_blocks = max(1, -(-n // batch))
    idx = np.zeros(n_blocks * batch, dtype=np.int32)
    idx[:n] = np.arange(n, dtype=np.int32)
    valid = np.zeros(n_blocks * batch, dtype=bool)
    valid[:n] = True
    return idx, valid


class Coach:
    def __init__(
        self,
        config: Config,
        host: HostData,
        device: DeviceData | None = None,
        log: Log | None = None,
        mesh=None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 10,
    ):
        self.config = config
        self.host = host
        self.mesh = mesh
        self.log = log or Log("coach", config.data.name)
        self.n_modal = len(host.modalities)

        # Graph form: dense MXU matmuls vs segment-sum SpMM (ops/graph.py).
        # Decided before device placement so the (discarded-in-dense-mode)
        # host-side sparse adjacency build is skipped entirely.
        from diffmm_tpu.parallel.mesh import MODEL_AXIS

        model_parallel = mesh.shape[MODEL_AXIS] if mesh is not None else 1
        self.dense_store_dtype, bytes_per_cell = resolve_dense_store(
            config.train.dense_store
        )
        if (
            self.dense_store_dtype == jnp.int4
            and not int4_jit_args_supported()
        ):
            self.log.info(
                "⚠️ backend cannot pass int4 arrays across the jit "
                "boundary (recursive-jit repack); dense_store falling "
                "back to int8"
            )
            self.dense_store_dtype, bytes_per_cell = resolve_dense_store(
                "int8"
            )
        # sub-bf16 storage budgets at its packed bytes/cell: the int8 epoch
        # A/B (0.585 vs 0.737 s/epoch) proves XLA fuses the narrow->bf16
        # convert into the matmul reads — no bf16 temporary is materialized,
        # so storage bytes are the real footprint and the dense form covers
        # a correspondingly larger catalog.
        self.dense_store_bytes_per_cell = bytes_per_cell
        budget_bytes = None
        if config.train.graph_form == "auto":
            if config.train.dense_budget_gb > 0:
                # operator-stated blocks budget — the honest path on
                # backends whose memory_stats() is None (incl. this
                # environment's tunnel TPU; see config.py dense_budget_gb)
                budget_bytes = int(config.train.dense_budget_gb * (1 << 30))
            else:
                budget_bytes = dense_graph_budget_bytes(
                    state_bytes=estimate_state_bytes(
                        self.n_modal, host.user_num, host.item_num,
                        config.base.latdim, config.base.denoise_dims(),
                        config.base.d_emb_size, host.feat_dims,
                        param_bytes=2
                        if config.base.denoise_param_dtype == "bf16" else 4,
                    )
                )
        self.dense_graphs = choose_graph_form(
            config.train.graph_form, self.n_modal, host.user_num,
            host.item_num, model_parallel,
            bytes_per_cell=bytes_per_cell,
            budget_bytes=budget_bytes,
        )
        if config.train.graph_form == "auto" and not self.dense_graphs:
            # observability: the sparse pick at a shape near the boundary
            # costs ~2.2x (yelp measurement, config.py dense_budget_gb) —
            # say what the numbers were so the operator can override
            ui = host.user_num * host.item_num
            blocks = (self.n_modal + 1) * ui * bytes_per_cell
            if bytes_per_cell < 2:  # the bf16 transient reserve, as gated
                blocks += ui * 2
            self.log.info(
                f"auto graph form: sparse (blocks+reserve "
                f"{blocks / 2**30:.2f} GiB > budget "
                f"{budget_bytes * max(model_parallel, 1) / 2**30:.2f} GiB; "
                f"train.dense_budget_gb overrides)"
            )

        store_cfg = config.train.train_store
        if store_cfg == "auto":
            # dense MXU graphs already spend the O(U·I) budget, so the
            # contiguous-row dense store is free to keep; the sparse form
            # exists because O(U·I) does NOT fit — its membership must be
            # O(nnz) too or the form's web-scale claim is void
            self.train_store_form = "dense" if self.dense_graphs else "csr"
        elif store_cfg in ("dense", "csr"):
            self.train_store_form = store_cfg
        else:
            raise ValueError(
                f"train.train_store must be auto|dense|csr, got {store_cfg!r}"
            )
        if device is not None:
            self.data = device
        else:
            self.data = to_device(
                host,
                with_sparse_adj=not self.dense_graphs,
                train_store=self.train_store_form,
                batch=config.train.batch,
            )
        if mesh is not None:
            check_batch_divisibility(config.train.batch, mesh)
            check_batch_divisibility(config.train.test_batch, mesh)
            self.data = shard_device_data(self.data, mesh)

        self.schedule = make_schedule(
            config.hyper.noise_scale,
            config.hyper.noise_min,
            config.hyper.noise_max,
            config.hyper.steps,
        )
        self.edge_buf_len = host.nnz + (-host.nnz % EDGE_ALIGN)
        # static CSR layout for the gather-form rebuild (ops/topk.py):
        # u_of_pos / lane_of_pos / pad_mask, device-resident once
        from diffmm_tpu.ops.topk import (
            make_csr_gather_layout,
            plan_rebuild_buckets,
        )

        u_of_pos, lane_of_pos, pad_mask = make_csr_gather_layout(
            host.user_degrees, self.edge_buf_len
        )
        self.rebuild_plan = None
        if config.train.rebuild_order == "degree":
            # degree-descending bucketed rebuild: per-bucket static top-k
            # widths; u_of_pos becomes the user's degree-sort row
            self.rebuild_plan = plan_rebuild_buckets(
                host.user_degrees, config.train.batch, host.item_num
            )
            u_of_pos = self.rebuild_plan.row_of_user[u_of_pos]
            self._reb_users_np = self.rebuild_plan.user_blocks
        elif config.train.rebuild_order != "identity":
            raise ValueError(
                "train.rebuild_order must be identity|degree, got "
                f"{config.train.rebuild_order!r}"
            )
        else:
            idx, _ = _pad_blocks(host.user_num, config.train.batch)
            self._reb_users_np = idx.reshape(-1, config.train.batch)
        self.n_reb_blocks = (
            sum(b.shape[0] for b in self._reb_users_np)
            if isinstance(self._reb_users_np, tuple)
            else self._reb_users_np.shape[0]
        )
        self.csr_gather_layout = tuple(
            jnp.asarray(a) for a in (u_of_pos, lane_of_pos, pad_mask)
        )
        self.segsum_plans = self._segsum_gate()
        self.modal_item_plan = self._ranked_gate()
        self.modal_wide_plan = self._stacked_gate()
        self.steps = make_train_steps(
            config, self.schedule, self.n_modal, host.k_max,
            segsum_plans=self.segsum_plans,
            rebuild_plan=self.rebuild_plan,
            modal_item_plan=self.modal_item_plan,
            item_num=host.item_num,
            modal_wide_plan=self.modal_wide_plan,
        )
        if config.train.epoch_scan < 1:
            raise ValueError(
                f"train.epoch_scan must be >= 1, got {config.train.epoch_scan}"
            )
        # fused multi-epoch programs, built lazily by train_epochs_fused:
        # one plain variant and one with in-program eval + best tracking
        self._fused_progs: dict = {}
        self._fused_eval_cache: dict = {}
        self.cum_dcg = dcg_table(config.base.topk)
        # Eval program bound to (topk, mesh): under model_parallel > 1 the
        # scoring runs per catalog shard with an explicit distributed top-k.
        self.eval_prog = make_eval_epoch(config.base.topk, mesh)

        self.timer = PhaseTimer()
        self.ckpt = None
        # Saving the full state (params + Adam moments for every denoiser ≈
        # hundreds of MB) measurably dominates sub-second epochs — save on an
        # interval, plus always on the final epoch.
        self.checkpoint_every = max(1, checkpoint_every)
        if checkpoint_dir is not None:
            from diffmm_tpu.utils.checkpoint import CheckpointManager

            self.ckpt = CheckpointManager(checkpoint_dir)

        self._init_state()
        if self.dense_graphs:
            self.data = self.data._replace(
                adj=self._make_adj(self.data.train_rows, self.data.train_cols)
            )

        self.log.info(f"USER: {host.user_num}, ITEM: {host.item_num}")
        self.log.info(f"NUM OF INTERACTIONS: {host.nnz}")
        self.log.info(
            f"Graph form: {'dense (MXU)' if self.dense_graphs else 'sparse (segment_sum)'}"
            f" | train store: {self.train_store_form}"
        )
        if host.synthesized:
            self.log.info(
                f"⚠️ synthesized missing feature blobs for: {host.synthesized}"
            )

    # ------------------------------------------------------------ init/reset
    def _init_state(self) -> None:
        """(Re)initialize params, optimizer state, RNG streams and per-run
        trackers (reference Main.py:85-110 prepares the same groups)."""
        cfg = self.config
        host = self.host
        tx = make_adam()
        self.key = jax.random.PRNGKey(cfg.base.seed)
        self.np_rng = np.random.default_rng(cfg.base.seed)
        self.key, k_gcn, *k_dns = jax.random.split(self.key, 2 + self.n_modal)
        self.gcn_params = init_gcn_params(
            k_gcn, host.user_num, host.item_num, cfg.base.latdim, host.feat_dims
        )
        hidden = cfg.base.denoise_dims()
        self.dn_params = [
            init_denoise_params(
                k, host.item_num, hidden, cfg.base.d_emb_size, cfg.base.latdim
            )
            for k in k_dns
        ]
        if cfg.base.denoise_param_dtype == "bf16":
            # bf16 storage for the denoiser params: grads/Adam moments follow
            # the param dtype (JAX tangents match primal dtype; optax inits
            # moments with zeros_like), adam_update casts the applied update
            # back — so the whole phase-1/2 state is half-width. The GCN
            # stays f32 (it feeds the accuracy-critical eval path).
            if cfg.base.denoiser_impl == "pallas":
                raise ValueError(
                    "denoise_param_dtype='bf16' is not supported with the "
                    "Pallas denoiser kernel (its VMEM plan assumes f32)"
                )
            self.dn_params = [
                jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
                for p in self.dn_params
            ]
        elif cfg.base.denoise_param_dtype != "f32":
            raise ValueError(
                f"base.denoise_param_dtype must be f32|bf16, got "
                f"{cfg.base.denoise_param_dtype!r}"
            )
        if self.mesh is not None:
            # Narrow params replicate; catalog-dim params (i_embs, the
            # denoiser wide layers) ride the model axis, so parameter AND
            # Adam-moment memory scale with it (SURVEY.md §2.3). Gradients
            # arrive with the same layout (psum over data, sharded over
            # model) and the update stays local — XLA inserts it all.
            from diffmm_tpu.parallel.sharding import (
                place_adam_state,
                shard_model_params,
            )

            self.gcn_params, self.dn_params, gcn_sh, dn_sh = shard_model_params(
                self.gcn_params, self.dn_params, self.mesh
            )
            self.gcn_opt_state = place_adam_state(
                tx.init(self.gcn_params), gcn_sh, self.mesh
            )
            self.dn_opt_states = [
                place_adam_state(tx.init(p), s, self.mesh)
                for p, s in zip(self.dn_params, dn_sh)
            ]
        else:
            self.gcn_opt_state = tx.init(self.gcn_params)
            self.dn_opt_states = [tx.init(p) for p in self.dn_params]
        self.modal_adjs: list[BiAdj] | None = None
        self.edge_buffers: list[jax.Array] | None = None
        # With train.donate_buffers, a dispatch that raises AFTER its inputs
        # were donated (OOM, interrupt) leaves self.*_params/opt_states/
        # edge_buffers pointing at deleted arrays; this flag turns the
        # confusing downstream deleted-buffer error into an actionable one.
        self._donated_state_lost = False
        # Best-epoch model capture (reference selects models by best test
        # Recall, `Main.py:71-78`, but never persists them): a host-side
        # snapshot of the GCN params + the epoch's rebuilt edge buffers —
        # everything the serving export needs to reproduce the best epoch
        # rather than the (often worse) final one.
        self.best_snapshot: dict | None = None
        self.epoch_times: list[float] = []
        # Cosine-LR horizon (T_max). run(epochs=N) moves it to the effective
        # count — same trajectory the reference produces when the toml's
        # [train].epoch is edited to N (`Main.py:93` T_max=total epochs).
        self.total_epochs: int = self.config.train.epoch
        self.timer.reset()

    def reset(self, seed: int | None = None) -> None:
        """Re-initialize params/optimizer/RNG for a fresh run with the SAME
        compiled programs — lets hyperparameter sweeps (tools/sweep.py) avoid
        the (very slow, §verify-skill) recompiles a new Coach would pay."""
        if seed is not None:
            self.config.base.seed = seed
        self._init_state()

    # --------------------------------------------------------- donation guard
    @contextlib.contextmanager
    def _donation_guard(self):
        """Mark Coach state invalid when a donating dispatch fails midway
        (its argument buffers may already be deleted)."""
        try:
            yield
        except BaseException:
            if self.config.train.donate_buffers:
                self._donated_state_lost = True
            raise

    def _check_state_valid(self) -> None:
        if self._donated_state_lost:
            raise RuntimeError(
                "Coach state was donated to a dispatch that failed "
                "(train.donate_buffers=true): params/opt-state/edge buffers "
                "may reference deleted device arrays. Restore from a "
                "checkpoint (restore_checkpoint) or reset() before reuse."
            )

    # ------------------------------------------------------------------ keys
    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _hp(self) -> dict:
        """Traced hyperparameter scalars for the jitted phase programs —
        read from config each epoch, so sweeps and mid-run changes never
        retrace (the structural knobs cl_method/steps/dims stay static)."""
        h = self.config.hyper
        f = jnp.float32
        return {
            "sim_weight": f(h.sim_weight),
            "reg": f(self.config.train.reg),
            "noise_degree": f(h.noise_degree),
            "cross_cl_temp": f(h.cross_cl_temp),
            "cross_cl_rate": f(h.cross_cl_rate),
            "modal_cl_temp": f(h.modal_cl_temp),
            "modal_cl_rate": f(h.modal_cl_rate),
            "modal_adj_weight": f(h.modal_adj_weight),
            "residual_weight": f(h.residual_weight),
        }

    def _put_batch(self, x: jax.Array) -> jax.Array:
        """Split one block's leading dim over the mesh's data axis."""
        return shard_batch(x, self.mesh) if self.mesh is not None else x

    def _put_blocks(self, x: jax.Array) -> jax.Array:
        """(n_blocks, batch) epoch input: batch dim over the data axis."""
        return shard_blocks(x, self.mesh) if self.mesh is not None else x

    def _reb_blocks_device(self):
        """Rebuild user blocks on device: one (n_blocks, batch) array
        (identity order) or the degree plan's per-bucket tuple."""
        if isinstance(self._reb_users_np, tuple):
            return tuple(
                self._put_blocks(jnp.asarray(b)) for b in self._reb_users_np
            )
        return self._put_blocks(jnp.asarray(self._reb_users_np))

    def _segsum_gate(self) -> tuple:
        """Host-made static plans for the MXU sorted-segment-sum on the
        sparse form: per-piece chunk-span verification on the sorted edge
        ids (ops/pallas/segsum.py). Single-device runs get the piecewise
        plan (make_segsum_plan; VMEM-oversized segment ranges tile into
        multiple kernel calls); mesh runs get the shard_map form
        (make_sharded_segsum_plan: per-shard local kernels at dynamic
        offsets + a psum of partials) — the web-scale configuration (sparse
        because the dense form doesn't fit, therefore usually multi-chip)
        keeps the reduction kernel instead of regressing to XLA scatter.
        DIFFMM_SEGSUM=xla forces the scatter path; =mxu forces planning on
        the CPU backend too (interpret-mode kernels — tests)."""
        import os

        mode = os.environ.get("DIFFMM_SEGSUM")
        if self.dense_graphs or mode == "xla":
            return (None, None)
        if jax.default_backend() in ("cpu",) and mode != "mxu":
            return (None, None)
        from diffmm_tpu.data.loader import pad_edges

        host = self.host
        d = self.config.base.latdim
        rows_p, cols_p = pad_edges(
            host.train_rows, host.train_cols, host.user_num, host.item_num
        )
        if self.mesh is not None:
            from diffmm_tpu.ops.pallas.segsum import make_sharded_segsum_plan
            from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            axes = (DATA_AXIS, MODEL_AXIS)
            u_plan = make_sharded_segsum_plan(
                rows_p, host.user_num, d, self.mesh, axes
            )
            i_plan = make_sharded_segsum_plan(
                np.sort(cols_p), host.item_num, d, self.mesh, axes
            )
            if u_plan or i_plan:
                self.log.info(
                    "Sparse SpMM: MXU sorted-segment-sum over the mesh "
                    f"(user={'on' if u_plan else 'off'}"
                    f"{f'/{u_plan.local_rows} rows/shard' if u_plan else ''}, "
                    f"item={'on' if i_plan else 'off'}"
                    f"{f'/{i_plan.local_rows} rows/shard' if i_plan else ''})"
                )
            return (u_plan, i_plan)
        from diffmm_tpu.ops.pallas.segsum import make_segsum_plan

        chunk = int(os.environ.get("DIFFMM_SEGSUM_CHUNK", "512"))
        u_plan = make_segsum_plan(rows_p, host.user_num, d, chunk=chunk)
        i_plan = make_segsum_plan(np.sort(cols_p), host.item_num, d, chunk=chunk)
        if u_plan or i_plan:
            self.log.info(
                "Sparse SpMM: MXU sorted-segment-sum "
                f"(user={'on' if u_plan else 'off'}"
                f"{f'/{len(u_plan)} tiles' if u_plan else ''}, "
                f"item={'on' if i_plan else 'off'}"
                f"{f'/{len(i_plan)} tiles' if i_plan else ''})"
            )
        return (u_plan, i_plan)

    def _ranked_gate(self):
        """Host-made rank-space plan for the modality graphs' ITEM
        direction — the one propagation direction no static plan can cover
        (the diffusion rebuild re-picks each user's items every epoch, so
        the item-major layout is dynamic; reference `Main.py:195-253`).
        The rank-space reduction (ops/pallas/segsum.py::RankedSegsumPlan)
        is exact for EVERY sorted layout by pigeonhole, so it only needs
        the static padded edge count. On a mesh the shard_map form
        (ShardedRankedPlan: per-shard rank-space kernels + local
        rank->segment inversion + psum) covers the same direction, so the
        multi-chip sparse configuration no longer regresses this direction
        to the XLA scatter (round-4 gap #2)."""
        import os

        mode = os.environ.get("DIFFMM_SEGSUM")
        if self.dense_graphs or mode == "xla":
            return None
        if jax.default_backend() in ("cpu",) and mode != "mxu":
            return None
        from diffmm_tpu.data.loader import pad_edges

        host = self.host
        rows_p, _ = pad_edges(
            host.train_rows, host.train_cols, host.user_num, host.item_num
        )
        chunk = int(os.environ.get("DIFFMM_SEGSUM_CHUNK", "512"))
        if self.mesh is not None:
            from diffmm_tpu.ops.pallas.segsum import make_sharded_ranked_plan
            from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            plan = make_sharded_ranked_plan(
                len(rows_p), host.item_num, self.config.base.latdim,
                self.mesh, (DATA_AXIS, MODEL_AXIS), chunk=chunk,
            )
            if plan is not None:
                self.log.info(
                    "Sparse SpMM: rank-space MXU reduction over the mesh "
                    "for the rebuilt modality item direction "
                    f"({len(plan.pieces)} pieces/shard, "
                    f"{plan.local_rows} rank rows/shard)"
                )
            return plan
        from diffmm_tpu.ops.pallas.segsum import make_ranked_plan

        plan = make_ranked_plan(
            len(rows_p), self.config.base.latdim, chunk=chunk
        )
        if plan is not None:
            self.log.info(
                "Sparse SpMM: rank-space MXU reduction for the rebuilt "
                f"modality item direction ({len(plan.pieces)} pieces)"
            )
        return plan

    def _stacked_gate(self):
        """Static user-direction plan at feature width M*latdim for the
        STACKED modal propagation (ops/graph.py::spmm_bi_modal_stacked):
        the M rebuilt modality graphs share the train-row layout
        (ops/topk.py), so their M user-direction reductions (and the M
        item-pass backward reductions) each run as ONE wide kernel call.
        Measured 0.581 -> 0.353 ms for the tiktok modal trio at d=64->192
        (sweeps/stacked_probe_r5.json). Requires the rank-space item plan
        (the stacked backward reduces by each modality's dynamic layout);
        ``train.stack_modal = false`` opts out."""
        import os

        if (
            not self.config.train.stack_modal
            or self.n_modal < 2
            or self.config.hyper.use_knn_adj
            or self.modal_item_plan is None
            or self.segsum_plans[0] is None
        ):
            return None
        from diffmm_tpu.data.loader import pad_edges

        host = self.host
        wide_d = self.n_modal * self.config.base.latdim
        rows_p, _ = pad_edges(
            host.train_rows, host.train_cols, host.user_num, host.item_num
        )
        chunk = int(os.environ.get("DIFFMM_SEGSUM_CHUNK", "512"))
        if self.mesh is not None:
            from diffmm_tpu.ops.pallas.segsum import make_sharded_segsum_plan
            from diffmm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            plan = make_sharded_segsum_plan(
                rows_p, host.user_num, wide_d, self.mesh,
                (DATA_AXIS, MODEL_AXIS),
            )
        else:
            from diffmm_tpu.ops.pallas.segsum import make_segsum_plan

            plan = make_segsum_plan(
                rows_p, host.user_num, wide_d, chunk=chunk
            )
        if plan is not None:
            self.log.info(
                "Sparse SpMM: stacked modal user-direction "
                f"({self.n_modal}x{self.config.base.latdim} wide)"
            )
        return plan

    def _knn_adjs(self) -> list:
        """Modality graphs from the KNN ablation (static per run — depend
        only on features + train edges, reference `Main.py:118-134`)."""
        from diffmm_tpu.ops.knn import build_knn_adj

        return [
            build_knn_adj(
                self.data.train_rows,
                self.data.train_cols,
                feats,
                self.host.user_num,
                self.host.item_num,
                self.config.hyper.knn_topk,
            )
            for feats in self.data.raw_feats
        ]

    def _make_adj(self, rows: jax.Array, cols: jax.Array):
        """Build a normalized adjacency in the run's chosen graph form."""
        if self.dense_graphs:
            adj = _build_dense_adj_jit(
                rows, cols, user_num=self.host.user_num,
                item_num=self.host.item_num,
                store_dtype=self.dense_store_dtype,
            )
        else:
            # rank machinery hoisted onto the adjacency whenever the
            # rank-space plan will consume it (fixed per build, read by
            # every reduction of the epoch's joint scan)
            adj = _build_adj_jit(
                rows, cols, user_num=self.host.user_num,
                item_num=self.host.item_num,
                with_rank_aux=self.modal_item_plan is not None,
            )
        if self.mesh is not None and self.dense_graphs:
            from diffmm_tpu.parallel.sharding import (
                catalog_sharded_or_replicated,
                replicated,
            )

            adj = adj._replace(
                mat=jax.device_put(
                    adj.mat, catalog_sharded_or_replicated(adj.mat, self.mesh)
                ),
                s_user=jax.device_put(adj.s_user, replicated(self.mesh)),
                s_item=jax.device_put(adj.s_item, replicated(self.mesh)),
            )
        return adj

    # ----------------------------------------------------------------- epoch
    def train_epoch(self, epoch: int, fence: bool = False) -> dict[str, float]:
        """One training epoch (phases 0-3).

        ``fence=True`` blocks on each phase's device results inside that
        phase's timer, making the per-phase timings honest attribution at
        the cost of inter-phase overlap: without it, phases that end in a
        dispatch (rebuild, whose outputs feed the joint scan) bill their
        device time to the NEXT phase that blocks — measured on tiktok the
        unfenced "joint" number carried most of the rebuild's device time.
        Default off: production epochs should overlap; bench/profiling
        passes fence=True for attribution."""
        self._check_state_valid()
        cfg = self.config
        data = self.data
        batch = cfg.train.batch
        if cfg.train.use_lr_scheduler:
            lr = cosine_lr(epoch, cfg.train.lr, self.total_epochs)
        else:
            lr = cfg.train.lr
        lr = jnp.float32(lr)
        hp = self._hp()

        # Phase 0: negative sampling (reference Main.py:137)
        with self.timer.phase("neg_sampling"):
            negs = negative_sampling(
                self._next_key(), data.train_rows, data.train_store, self.host.item_num
            )
            if fence:
                jax.block_until_ready(negs)

        # Phase 1: diffusion training (reference Main.py:144-192) — all blocks
        # in one compiled scan (the reference dispatches per DataLoader batch)
        user_perm = self.np_rng.permutation(self.host.user_num).astype(np.int32)
        idx, valid = _pad_blocks(self.host.user_num, batch)
        n_diff_blocks = len(idx) // batch
        users_blocks = self._put_blocks(
            jnp.asarray(user_perm[idx % self.host.user_num]).reshape(
                n_diff_blocks, batch
            )
        )
        weight_blocks = self._put_blocks(
            jnp.asarray(valid.astype(np.float32)).reshape(n_diff_blocks, batch)
        )
        with self.timer.phase("diffusion"), self._donation_guard():
            self.dn_params, self.dn_opt_states, acc = self.steps.diffusion_epoch(
                self.dn_params,
                self.dn_opt_states,
                self.gcn_params,
                data.raw_feats,
                data.train_store,
                users_blocks,
                weight_blocks,
                jax.random.split(self._next_key(), n_diff_blocks),
                lr,
                hp,
            )
            # keep the loss accumulator ON DEVICE: materializing it here
            # blocks the host on the diffusion dispatch (one full tunnel
            # round-trip, ~28 ms on this environment) before rebuild/joint
            # can even be enqueued. _joint_phase converts it after the
            # joint accumulator has been fetched, when it is already ready.
            modal_loss_acc = acc
            if fence:
                jax.block_until_ready(acc)

        # Phase 2: modality graph rebuild (reference Main.py:195-253), or the
        # KNN ablation (reference Main.py:118-134,255-288 — static per run,
        # so computed once and cached)
        if cfg.hyper.use_knn_adj:
            if self.modal_adjs is None:
                self.modal_adjs = self._knn_adjs()
            return self._joint_phase(epoch, lr, negs, modal_loss_acc, hp)
        # precomputed block layout (Coach.__init__): identity order — the
        # stacked per-block top-k tables form a (U_pad, k_max) matrix and
        # the CSR buffers build by one gather (no scatter) — or the
        # degree-descending buckets of train.rebuild_order="degree"
        with self.timer.phase("rebuild"):
            edge_buffers = self.steps.rebuild_epoch(
                self.dn_params,
                data.train_store,
                self._reb_blocks_device(),
                jax.random.split(self._next_key(), self.n_reb_blocks),
                # traced scalar: sweeps change it without a retrace; inside
                # the jitted program the dynamic q_sample+where path runs
                # regardless (its cost is noise next to the denoiser MLPs)
                jnp.int32(cfg.hyper.sampling_step),
                *self.csr_gather_layout,
                self.host.item_num,
            )
            if self.mesh is not None:
                edge_buffers = [shard_batch(b, self.mesh) for b in edge_buffers]
            self.edge_buffers = edge_buffers
            self.modal_adjs = [
                self._make_adj(data.train_rows, buf) for buf in edge_buffers
            ]
            if fence:
                jax.block_until_ready((edge_buffers, self.modal_adjs))

        return self._joint_phase(epoch, lr, negs, modal_loss_acc, hp)

    def _joint_phase(self, epoch, lr, negs, modal_loss_acc, hp):
        cfg = self.config
        data = self.data
        batch = cfg.train.batch
        # Phase 3: joint GCN training (reference Main.py:291-377)
        perm = self.np_rng.permutation(self.host.nnz).astype(np.int32)
        idx, _ = _pad_blocks(self.host.nnz, batch)
        # wrap-pad the final partial block with recycled interactions
        perm_pad = perm[idx % self.host.nnz]
        perm_dev = jnp.asarray(perm_pad)
        users_ep = data.train_rows.take(perm_dev)
        pos_ep = data.train_cols.take(perm_dev)
        neg_ep = negs.take(perm_dev)
        n_joint_blocks = len(perm_pad) // batch
        with self.timer.phase("joint"), self._donation_guard():
            self.gcn_params, self.gcn_opt_state, acc = self.steps.joint_epoch(
                self.gcn_params,
                self.gcn_opt_state,
                data.adj,
                tuple(self.modal_adjs),
                data.raw_feats,
                self._put_blocks(users_ep.reshape(n_joint_blocks, batch)),
                self._put_blocks(pos_ep.reshape(n_joint_blocks, batch)),
                self._put_blocks(neg_ep.reshape(n_joint_blocks, batch)),
                jax.random.split(self._next_key(), n_joint_blocks),
                lr,
                hp,
            )
            joint_acc = np.asarray(acc)

        # by now the joint accumulator has been fetched, so the (earlier)
        # diffusion accumulator is ready — this asarray does not stall
        return self._epoch_result(joint_acc, np.asarray(modal_loss_acc))

    def _epoch_result(self, joint_acc, modal_acc) -> dict[str, float]:
        """One epoch's loss dict from the phase accumulators — accounting
        mirrors reference Main.py:379-388 (floor-division step counts).
        Shared by the single-epoch and fused paths so the quirk can never
        desynchronize between them."""
        train_steps_n = max(1, self.host.nnz // self.config.train.batch)
        diff_steps_n = max(1, self.host.user_num // self.config.train.batch)
        result = {
            "Loss": joint_acc[0] / train_steps_n,
            "BPR Loss": joint_acc[1] / train_steps_n,
            "reg loss": joint_acc[2] / train_steps_n,
            "CL loss": joint_acc[3] / train_steps_n,
        }
        names = {"image": "image loss", "text": "text loss", "audio": "audio loss"}
        for m, mod in enumerate(self.host.modalities):
            result[names[mod]] = modal_acc[m] / diff_steps_n
        return result

    def ensure_modal_adjs(self) -> list | None:
        """Modality adjacencies for eval/serving, rebuilt lazily from the
        edge buffers when the fused epoch path invalidated them; None only
        when no trained epoch (or restored checkpoint) exists."""
        if self.modal_adjs is None and self.edge_buffers is not None:
            self.modal_adjs = [
                self._make_adj(self.data.train_rows, buf)
                for buf in self.edge_buffers
            ]
        return self.modal_adjs

    # ----------------------------------------------------------- fused epochs
    def _fused_adj_builder(self):
        """In-program equivalent of :meth:`_make_adj` for the fused epoch
        scan — same builders, with the mesh placements the single-epoch path
        applies via device_put expressed as sharding constraints."""
        from diffmm_tpu.ops.graph import (
            build_bi_adj_device,
            build_dense_bi_adj_device,
        )

        user_num, item_num = self.host.user_num, self.host.item_num
        if not self.dense_graphs:
            with_aux = self.modal_item_plan is not None

            def build(rows, cols):
                return build_bi_adj_device(
                    rows, cols, user_num=user_num, item_num=item_num,
                    with_rank_aux=with_aux,
                )
            return build

        store = self.dense_store_dtype
        mat_sh = rep_sh = None
        if self.mesh is not None:
            from diffmm_tpu.parallel.sharding import catalog_spec, replicated

            rep_sh = replicated(self.mesh)
            mat_sh = catalog_spec(item_num, self.mesh)

        def build(rows, cols):
            adj = build_dense_bi_adj_device(
                rows, cols, user_num=user_num, item_num=item_num,
                store_dtype=store,
            )
            if mat_sh is not None:
                adj = adj._replace(
                    mat=jax.lax.with_sharding_constraint(adj.mat, mat_sh),
                    s_user=jax.lax.with_sharding_constraint(adj.s_user, rep_sh),
                    s_item=jax.lax.with_sharding_constraint(adj.s_item, rep_sh),
                )
            return adj

        return build

    def train_epochs_fused(
        self, epoch0: int, n: int, eval_split: str | None = None
    ):
        """Train epochs ``[epoch0, epoch0 + n)`` as ONE compiled program.

        A ``lax.scan`` over full four-phase epochs (steps.make_epochs_fused)
        — one dispatch instead of the single-epoch path's several per epoch.
        The RNG key stream and the numpy permutation stream advance exactly
        as ``n`` train_epoch calls would, so trajectories and checkpoints
        stay interchangeable between the two paths
        (tests/test_fused_epochs.py). Returns one result dict per epoch with
        the same loss accounting as :meth:`train_epoch`.

        With ``eval_split`` set, the chunk also runs the full-catalog
        ranking eval IN-PROGRAM on each tstEpoch boundary (``lax.cond`` —
        non-eval epochs skip the compute) and tracks the best-Recall
        epoch's model in the scan carry, so fusion works at the reference's
        every-epoch eval cadence. Returns ``(results, eval_results,
        best_bundle)``: per-epoch eval dicts (None on non-eval epochs) and
        ``(best_recall_sum, best_gcn_params, best_edge_buffers)`` device
        arrays (None when no epoch evaluated).
        """
        cfg = self.config
        if cfg.hyper.use_knn_adj:
            raise ValueError(
                "epoch fusion requires the diffusion rebuild path "
                "(hyper.use_knn_adj rebuilds nothing per epoch)"
            )
        self._check_state_valid()
        host = self.host
        batch = cfg.train.batch
        idx, valid = _pad_blocks(host.user_num, batch)
        nb_d = len(idx) // batch
        weight_blocks = self._put_blocks(
            jnp.asarray(valid.astype(np.float32)).reshape(nb_d, batch)
        )
        reb_users = self._reb_blocks_device()
        jidx, _ = _pad_blocks(host.nnz, batch)
        nb_j = len(jidx) // batch

        # per-epoch host draws, in the exact single-epoch order
        diff_users = np.empty((n, nb_d, batch), np.int32)
        joint_perms = np.empty((n, nb_j, batch), np.int32)
        lrs = np.empty((n,), np.float32)
        for e in range(n):
            ep = epoch0 + e
            lrs[e] = (
                cosine_lr(ep, cfg.train.lr, self.total_epochs)
                if cfg.train.use_lr_scheduler
                else cfg.train.lr
            )
            user_perm = self.np_rng.permutation(host.user_num).astype(np.int32)
            diff_users[e] = user_perm[idx % host.user_num].reshape(nb_d, batch)
            perm = self.np_rng.permutation(host.nnz).astype(np.int32)
            joint_perms[e] = perm[jidx % host.nnz].reshape(nb_j, batch)

        def put3(x):
            x = jnp.asarray(x)
            if self.mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            from diffmm_tpu.parallel.mesh import DATA_AXIS

            return jax.device_put(
                x, NamedSharding(self.mesh, P(None, None, DATA_AXIS))
            )

        if self.edge_buffers is not None:
            bufs0 = tuple(self.edge_buffers)
        else:
            # one DISTINCT zero buffer per modality: bufs0 is donated to the
            # fused program (train.donate_buffers), and donating the same
            # buffer at two argument positions is an execution error
            def zero():
                z = jnp.zeros((self.edge_buf_len,), jnp.int32)
                return shard_batch(z, self.mesh) if self.mesh is not None else z

            bufs0 = tuple(zero() for _ in range(self.n_modal))

        # in-program eval: flags per epoch + the split's prepared blocks
        eval_blocks = None
        flags = None
        if eval_split is not None:
            flags = [(epoch0 + e) % cfg.train.tstEpoch == 0 for e in range(n)]
            if any(flags):
                eval_blocks = self._fused_eval_blocks(eval_split)
        with_eval = eval_blocks is not None

        prog = self._fused_progs.get(with_eval)
        if prog is None:
            from diffmm_tpu.train.steps import make_epochs_fused

            cbuf = cblk = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from diffmm_tpu.parallel.mesh import DATA_AXIS

                edge_sh = NamedSharding(self.mesh, P(DATA_AXIS))
                blk_sh = NamedSharding(self.mesh, P(None, DATA_AXIS))
                cbuf = lambda b: jax.lax.with_sharding_constraint(b, edge_sh)
                cblk = lambda b: jax.lax.with_sharding_constraint(b, blk_sh)
            prog = make_epochs_fused(
                self.steps, host.item_num, self._fused_adj_builder(),
                constrain_buf=cbuf, constrain_blocks=cblk,
                eval_fn=self._make_fused_eval_fn() if with_eval else None,
                donate=cfg.train.donate_buffers,
            )
            self._fused_progs[with_eval] = prog

        data = self.data
        eval_sums = best_recall = best_g = best_bufs = None
        with self.timer.phase("fused"), self._donation_guard():
            common = (
                self.key, self.dn_params, self.dn_opt_states, self.gcn_params,
                self.gcn_opt_state, bufs0, data.raw_feats, data.train_store,
                data.train_rows, data.train_cols, data.adj,
                put3(diff_users), weight_blocks, reb_users, put3(joint_perms),
                jnp.asarray(lrs),
            )
            tail = (
                self._hp(), jnp.int32(cfg.hyper.sampling_step),
                *self.csr_gather_layout,
            )
            if with_eval:
                n_eval, eval_inputs = eval_blocks
                (
                    self.key, self.dn_params, self.dn_opt_states,
                    self.gcn_params, self.gcn_opt_state, bufs,
                    modal_accs, joint_accs, eval_sums,
                    best_recall, best_g, best_bufs,
                ) = prog(*common, jnp.asarray(flags), eval_inputs, *tail)
            else:
                (
                    self.key, self.dn_params, self.dn_opt_states,
                    self.gcn_params, self.gcn_opt_state, bufs,
                    modal_accs, joint_accs,
                ) = prog(*common, *tail)
        self.edge_buffers = list(bufs)
        # adjacencies rebuild lazily (ensure_modal_adjs): the scan consumed
        # its in-program ones, and 3 dense (U, I) builds per chunk would be
        # pure waste when the next step is another chunk, not an eval
        self.modal_adjs = None

        modal_accs = np.asarray(modal_accs)
        joint_accs = np.asarray(joint_accs)
        results = [
            self._epoch_result(joint_accs[e], modal_accs[e]) for e in range(n)
        ]
        if eval_split is None:
            return results
        if not with_eval:
            # empty split (builder valMat edge case): mirror test_epoch's
            # zero metrics on the flagged epochs
            zero = {"Recall": 0.0, "NDCG": 0.0, "Precision": 0.0}
            return results, [zero if f else None for f in flags], None
        eval_sums = np.asarray(eval_sums)
        eval_results = [
            {
                "Recall": float(eval_sums[e, 0]) / n_eval,
                "NDCG": float(eval_sums[e, 1]) / n_eval,
                "Precision": float(eval_sums[e, 2]) / n_eval,
            }
            if flags[e]
            else None
            for e in range(n)
        ]
        return results, eval_results, (best_recall, best_g, best_bufs)

    def _fused_eval_blocks(self, split: str):
        """test_epoch's block prep, done once per split and cached:
        ``(n_test, (users, valid, items, counts, cum_dcg))`` with every
        block array mesh-placed; None for an empty split."""
        if split in self._fused_eval_cache:
            return self._fused_eval_cache[split]
        data = self.data
        if split == "test":
            e_users, e_items, e_counts = (
                data.test_users, data.test_items, data.test_counts,
            )
        elif split == "val":
            if data.val_users is None:
                raise ValueError(f"{self.host.name}: no valMat was loaded")
            e_users, e_items, e_counts = (
                data.val_users, data.val_items, data.val_counts,
            )
        else:
            raise ValueError(f"unknown eval split {split!r}")
        n_test = int(e_users.shape[0])
        if n_test == 0:
            self._fused_eval_cache[split] = None
            return None
        batch = self.config.train.test_batch
        idx, valid = _pad_blocks(n_test, batch)
        idx_w = jnp.asarray(idx % max(n_test, 1))
        nb = len(idx) // batch
        blocks = (
            self._put_blocks(e_users.take(idx_w).reshape(nb, batch)),
            self._put_blocks(jnp.asarray(valid).reshape(nb, batch)),
            self._put_blocks(e_items.take(idx_w, axis=0).reshape(nb, batch, -1)),
            self._put_blocks(e_counts.take(idx_w).reshape(nb, batch)),
            self.cum_dcg,
        )
        self._fused_eval_cache[split] = (n_test, blocks)
        return self._fused_eval_cache[split]

    def _make_fused_eval_fn(self):
        """In-program eval for the fused scan: GCN forward + the (mesh-
        aware) ranking program, summing Recall/NDCG/Precision over all
        test users — the same computation test_epoch dispatches."""
        gcn_forward = self.steps.gcn_forward
        eval_prog = self.eval_prog

        def eval_fn(g, modal_adjs, adj, raw_feats, train_store, hp,
                    eval_inputs):
            users, valid, t_items, t_counts, cum_dcg = eval_inputs
            u_final, i_final = gcn_forward(g, adj, tuple(modal_adjs),
                                           raw_feats, hp)
            return eval_prog(u_final, i_final, users, valid, train_store,
                             t_items, t_counts, cum_dcg)

        return eval_fn

    def _capture_best_from(self, best_g, best_bufs, epoch: int) -> None:
        """capture_best from the fused chunk's in-carry best state."""
        self.best_snapshot = {
            "epoch": epoch,
            "gcn_params": jax.device_get(best_g),
            "edge_buffers": [jax.device_get(b) for b in best_bufs],
        }

    def _chunk_size(self, epoch: int, n_epochs: int) -> int:
        """train.epoch_scan when a full scan-length window fits from
        ``epoch`` with no interior CHECKPOINT boundary, else 1. Eval
        boundaries don't break chunks — evals run in-program under
        ``lax.cond`` with best-state tracking in the carry. Only EXACT
        epoch_scan-sized chunks fuse: every distinct chunk length is a
        distinct scan length and therefore a fresh XLA compile (measured
        37 s on the tunnel for a one-off 9-epoch tail — far more than the
        ~0.05 s/epoch the fusion saves), so shrunk tail or
        checkpoint-misaligned windows run the already-compiled
        single-epoch path instead."""
        cfg = self.config
        if cfg.train.epoch_scan <= 1 or cfg.hyper.use_knn_adj:
            return 1
        n = cfg.train.epoch_scan
        if n > n_epochs - epoch:
            return 1
        for j in range(n - 1):  # interior epochs epoch .. epoch+n-2
            k = epoch + j
            if self.ckpt is not None and (k + 1) % self.checkpoint_every == 0:
                return 1
        return n

    # ------------------------------------------------------------------ eval
    def test_epoch(self, split: str = "test") -> dict[str, float]:
        """Full-catalog ranking eval (reference `Main.py:390-420`).

        ``split`` may be "val" when the dataset ships a validation matrix —
        additive over the reference, which never loads valMat.pkl
        (`DataHandler.py:30-31`) and selects models on test Recall.
        """
        self._check_state_valid()
        assert self.ensure_modal_adjs() is not None, (
            "eval depends on the epoch's rebuilt modality graphs "
            "(reference Main.py:398-400); run train_epoch first"
        )
        cfg = self.config
        data = self.data
        if split == "test":
            e_users, e_items, e_counts = (
                data.test_users, data.test_items, data.test_counts,
            )
        elif split == "val":
            if data.val_users is None:
                raise ValueError(f"{self.host.name}: no valMat was loaded")
            e_users, e_items, e_counts = (
                data.val_users, data.val_items, data.val_counts,
            )
        else:
            raise ValueError(f"unknown eval split {split!r}")
        if int(e_users.shape[0]) == 0:
            # a shipped split can be empty (e.g. a builder-produced valMat
            # when every user had too few interactions to hold one out)
            self.log.info(f"⚠️ eval split {split!r} has no users; skipping")
            return {"Recall": 0.0, "NDCG": 0.0, "Precision": 0.0}
        with self.timer.phase("eval"):
            u_final, i_final = self.steps.gcn_forward(
                self.gcn_params, data.adj, tuple(self.modal_adjs),
                data.raw_feats, self._hp(),
            )
            n_test = int(e_users.shape[0])
            batch = cfg.train.test_batch
            idx, valid = _pad_blocks(n_test, batch)
            idx_w = idx % max(n_test, 1)
            nb = len(idx) // batch
            users = e_users.take(jnp.asarray(idx_w))
            t_items = e_items.take(jnp.asarray(idx_w), axis=0)
            t_counts = e_counts.take(jnp.asarray(idx_w))
            valid_dev = jnp.asarray(valid)
            sums = np.asarray(
                self.eval_prog(
                    u_final,
                    i_final,
                    self._put_blocks(users.reshape(nb, batch)),
                    self._put_blocks(valid_dev.reshape(nb, batch)),
                    data.train_store,
                    self._put_blocks(t_items.reshape(nb, batch, -1)),
                    self._put_blocks(t_counts.reshape(nb, batch)),
                    self.cum_dcg,
                )
            )
        return {
            "Recall": float(sums[0]) / n_test,
            "NDCG": float(sums[1]) / n_test,
            "Precision": float(sums[2]) / n_test,
        }

    # ------------------------------------------------------- best snapshot
    def capture_best(self, epoch: int) -> None:
        """Host-copy the state that reproduces this epoch's eval: GCN params
        + rebuilt modality edge buffers (a few MB; the denoisers don't feed
        eval). Called whenever best Recall improves."""
        self.best_snapshot = {
            "epoch": epoch,
            "gcn_params": jax.device_get(self.gcn_params),
            "edge_buffers": (
                None
                if self.config.hyper.use_knn_adj
                else [jax.device_get(b) for b in self.edge_buffers]
            ),
        }

    def best_state(self):
        """(gcn_params, modal_adjs) of the best-Recall epoch, placed like the
        live training state (mesh shardings included); falls back to the
        current state when no snapshot exists (e.g. eval never ran)."""
        snap = self.best_snapshot
        if snap is None:
            # the fallback reads the LIVE buffers — refuse with the donation
            # diagnostic instead of a raw deleted-buffer error if a donating
            # dispatch failed mid-epoch (the snapshot path below only reads
            # host copies + sharding metadata, so it stays serveable)
            self._check_state_valid()
            assert self.ensure_modal_adjs() is not None, (
                "no trained epoch and no best snapshot to serve from"
            )
            return self.gcn_params, self.modal_adjs
        params = jax.tree.map(
            lambda s, cur: jax.device_put(s, cur.sharding),
            snap["gcn_params"],
            self.gcn_params,
        )
        if self.config.hyper.use_knn_adj:
            # KNN modality graphs are a pure function of data — static per run
            modal_adjs = self.modal_adjs or self._knn_adjs()
        else:
            bufs = [
                jax.device_put(b, cur.sharding)
                for b, cur in zip(snap["edge_buffers"], self.edge_buffers)
            ]
            modal_adjs = [
                self._make_adj(self.data.train_rows, b) for b in bufs
            ]
        return params, modal_adjs

    # ----------------------------------------------------------- checkpoints
    def _ckpt_arrays(self):
        # Under the KNN ablation there are no diffusion-rebuilt edge buffers
        # (the graphs are a pure function of data) — store an empty list so
        # save/restore trees always match.
        if self.config.hyper.use_knn_adj:
            buffers = []
        else:
            buffers = self.edge_buffers
        snap = self.best_snapshot
        # The best snapshot rides in the same tree so resume + export-best is
        # exact; before any eval it's placeholdered by the live state (aux
        # best_snapshot_epoch = -1 marks it absent).
        if snap is None:
            best_params, best_buffers = self.gcn_params, buffers
        else:
            best_params = snap["gcn_params"]
            best_buffers = [] if snap["edge_buffers"] is None else snap["edge_buffers"]
        return {
            "gcn_params": self.gcn_params,
            "gcn_opt_state": self.gcn_opt_state,
            "dn_params": self.dn_params,
            "dn_opt_states": self.dn_opt_states,
            "edge_buffers": buffers,
            "best_gcn_params": best_params,
            "best_edge_buffers": best_buffers,
        }

    def save_checkpoint(self, epoch: int, best: dict[str, float]) -> None:
        assert self.ckpt is not None
        self._check_state_valid()
        from diffmm_tpu.utils.checkpoint import key_to_list, rng_state_to_json

        self.ckpt.save(
            epoch,
            self._ckpt_arrays(),
            aux={
                "epoch": epoch,
                "best": best,
                "key": key_to_list(self.key),
                "np_rng": rng_state_to_json(self.np_rng),
                "best_snapshot_epoch": (
                    -1 if self.best_snapshot is None
                    else self.best_snapshot["epoch"]
                ),
            },
        )

    def restore_checkpoint(self) -> dict[str, float] | None:
        """Restore the latest checkpoint if one exists; returns the saved
        best-metric dict (with ``epoch`` advanced past the saved one)."""
        if self.ckpt is None or self.ckpt.latest_epoch() is None:
            return None
        from diffmm_tpu.utils.checkpoint import key_from_list, rng_state_from_json

        template = self._ckpt_arrays()
        if template["edge_buffers"] is None:
            # fresh Coach: build a same-structure template for the saved
            # rebuilt-graph buffers — with the mesh placement the training
            # path uses (orbax restores with the template's shardings; a
            # single-device buffer would collide with the mesh-sharded edge
            # arrays in _make_adj)
            buf = [
                jnp.zeros(self.edge_buf_len, dtype=jnp.int32)
                for _ in range(self.n_modal)
            ]
            if self.mesh is not None:
                buf = [shard_batch(b, self.mesh) for b in buf]
            template["edge_buffers"] = buf
            if template["best_edge_buffers"] is None:
                template["best_edge_buffers"] = buf
        _, arrays, aux = self.ckpt.restore(template=template)
        self.gcn_params = arrays["gcn_params"]
        self.gcn_opt_state = arrays["gcn_opt_state"]
        self.dn_params = arrays["dn_params"]
        self.dn_opt_states = arrays["dn_opt_states"]
        if self.config.hyper.use_knn_adj:
            self.edge_buffers = None
            self.modal_adjs = self._knn_adjs()
        else:
            self.edge_buffers = arrays["edge_buffers"]
            if self.edge_buffers is not None:
                self.modal_adjs = [
                    self._make_adj(self.data.train_rows, buf)
                    for buf in self.edge_buffers
                ]
        self.key = key_from_list(aux["key"])
        self.np_rng = rng_state_from_json(aux["np_rng"])
        # every piece of donated state has just been replaced from disk
        self._donated_state_lost = False
        snap_epoch = aux.get("best_snapshot_epoch", -1)
        if snap_epoch >= 0:
            self.best_snapshot = {
                "epoch": snap_epoch,
                "gcn_params": jax.device_get(arrays["best_gcn_params"]),
                "edge_buffers": (
                    None
                    if self.config.hyper.use_knn_adj
                    else [jax.device_get(b) for b in arrays["best_edge_buffers"]]
                ),
            }
        best = dict(aux["best"])
        best["epoch"] = aux["epoch"]
        self.log.info(f"Resumed from checkpoint at epoch {aux['epoch']} ♻️")
        return best

    # ------------------------------------------------------------------- run
    def make_print(
        self, name: str, epoch: int, results: dict[str, float],
        total: int | None = None,
    ) -> str:
        """Reference `Main.py:26-33`."""
        s = f"Epoch {epoch}/{total or self.config.train.epoch}, {name}: "
        s += ", ".join(f"{k}={v:.5f}" for k, v in results.items())
        return s + "  "

    def run(
        self, epochs: int | None = None, eval_split: str = "test"
    ) -> dict[str, float]:
        """Epoch loop with best tracking (reference `Main.py:45-82`)."""
        cfg = self.config
        n_epochs = epochs if epochs is not None else cfg.train.epoch
        self.total_epochs = n_epochs  # cosine T_max follows the effective count
        recall_max = ndcg_max = precision_max = 0.0
        his_max = [0.0, 0.0, 0.0]
        best_epoch = 0
        start_epoch = 0
        resumed = self.restore_checkpoint()
        if resumed is not None:
            start_epoch = resumed["epoch"] + 1
            recall_max = resumed.get("Recall", 0.0)
            ndcg_max = resumed.get("NDCG", 0.0)
            precision_max = resumed.get("Precision", 0.0)
            his_max = resumed.get("his_max", his_max)
            best_epoch = resumed.get("best_epoch", 0)
        self.log.info("Model Initialized ✅")
        self.log.info("Start training 🚀")
        try:
            epoch = start_epoch
            while epoch < n_epochs:
                # train.epoch_scan > 1: fuse epoch runs (evals included,
                # in-program) into one compiled program; chunk==1 keeps the
                # single-epoch path (and its per-phase timers).
                chunk = self._chunk_size(epoch, n_epochs)
                t0 = time.perf_counter()
                eval_results = best_bundle = None
                if chunk > 1:
                    results, eval_results, best_bundle = (
                        self.train_epochs_fused(epoch, chunk, eval_split)
                    )
                else:
                    results = [self.train_epoch(epoch)]
                jax.block_until_ready(self.gcn_params["u_embs"])
                chunk_s = time.perf_counter() - t0
                self.epoch_times.extend([chunk_s / chunk] * chunk)
                # Failure detection (absent in the reference, SURVEY.md §5.3):
                # catch divergence at the epoch boundary (chunk boundary when
                # fused); with checkpointing on, the last good epoch is
                # already on disk for resume.
                for j, result in enumerate(results):
                    if not all(np.isfinite(v) for v in result.values()):
                        self.log.info(
                            f"💥 Non-finite losses at epoch {epoch + j}: {result}"
                        )
                        raise FloatingPointError(
                            f"training diverged at epoch {epoch + j}: {result}"
                        )
                    self.log.info(
                        self.make_print("⏩ Train", epoch + j, result, n_epochs)
                    )
                self.log.info(
                    f"⏱️ epoch {self.epoch_times[-1]:.2f}s "
                    f"({self.timer.summary()})"
                )
                self.timer.reset()
                if chunk > 1:
                    # evals already ran in-program; fold them into the best
                    # tracking exactly as the single-epoch branch below does
                    improved = False
                    for j, result in enumerate(eval_results or []):
                        if result is None:
                            continue
                        his_max = [max(a, b) for a, b in zip(
                            [result["Recall"], result["NDCG"],
                             result["Precision"]], his_max
                        )]
                        if result["Recall"] > recall_max:
                            recall_max = result["Recall"]
                            ndcg_max = result["NDCG"]
                            precision_max = result["Precision"]
                            best_epoch = epoch + j
                            improved = True
                        self.log.info(
                            self.make_print("🧪 Test", epoch + j, result, n_epochs)
                        )
                    if improved and best_bundle is not None:
                        self._capture_best_from(
                            best_bundle[1], best_bundle[2], best_epoch
                        )
                epoch = epoch + chunk - 1  # chunk's last epoch: ckpt here
                tst_flag = chunk == 1 and epoch % cfg.train.tstEpoch == 0
                if tst_flag:
                    result = self.test_epoch(eval_split)
                    his_max = [max(a, b) for a, b in zip(
                        [result["Recall"], result["NDCG"], result["Precision"]], his_max
                    )]
                    if result["Recall"] > recall_max:
                        recall_max = result["Recall"]
                        ndcg_max = result["NDCG"]
                        precision_max = result["Precision"]
                        best_epoch = epoch
                        self.capture_best(epoch)
                    self.log.info(self.make_print("🧪 Test", epoch, result, n_epochs))
                self.log.info(
                    f"💡 Current best: Epoch: {best_epoch}, "
                    f"Recall: {recall_max:.5f}({his_max[0]:.5f}), "
                    f"NDCG: {ndcg_max:.5f}({his_max[1]:.5f}), "
                    f"Precision: {precision_max:.5f}({his_max[2]:.5f})"
                )
                if self.ckpt is not None and (
                    (epoch + 1) % self.checkpoint_every == 0
                    or epoch == n_epochs - 1
                ):
                    self.save_checkpoint(
                        epoch,
                        {
                            "Recall": recall_max,
                            "NDCG": ndcg_max,
                            "Precision": precision_max,
                            "his_max": his_max,
                            "best_epoch": best_epoch,
                        },
                    )
                epoch += 1
        except KeyboardInterrupt:
            self.log.info("🈲 Training interrupted by user!")
        finally:
            if self.ckpt is not None:
                self.ckpt.wait()  # join the in-flight async save before exit
        return {
            "best_epoch": best_epoch,
            "Recall": recall_max,
            "NDCG": ndcg_max,
            "Precision": precision_max,
        }
