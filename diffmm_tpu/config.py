"""Typed TOML configuration for diffmm_tpu.

Mirrors the reference config surface (reference `Conf.py:9-77`): four sections
(`base`, `data`, `hyper`, `train`) loaded from TOML with code defaults. Unlike
the reference — whose dataclass constructors raise `TypeError` on the legacy
keys still present in half the shipped tomls (see reference `conf/tiktok.toml`,
`conf/baby.toml`, `conf/ifashion.toml`) — this loader accepts and maps legacy
aliases so every shipped config loads with one consistent schema:

  * ``sampling_steps``  -> ``sampling_step``   (plural legacy spelling)
  * ``e_loss``          -> ``sim_weight``      (old name of the same weight)
  * ``keepRate``/``trans``/``rebuild_k``/``norm``/``sampling_noise`` are
    accepted and ignored (dead knobs of the reference's `Params.py` era).

`denoise_dim` keeps the reference's stringified-list encoding ("[1024]",
parsed with ast.literal_eval at reference `Main.py:97`) but also accepts a
real TOML list.

Environment knobs (process-level overrides, intentionally NOT config fields
— they select implementation paths for probes/tests, never semantics; each
warns or logs when non-default):

  * ``DIFFMM_SEGSUM=xla|mxu`` — force the sparse reduction path
    (train/coach.py::_segsum_gate; ``mxu`` enables interpret-mode plans on
    the CPU backend for tests).
  * ``DIFFMM_SEGSUM_CHUNK`` — edges per one-hot MXU matmul in the segsum
    plans (default 512; carried ON the plan so execution always matches the
    window check — ops/pallas/segsum.py::StaticSegsumPlan).
  * ``DIFFMM_SEGSUM_VMEM_MB`` — segsum VMEM gate budget (default 64, the
    measured in-program safe bound); read ONCE at segsum import.
  * ``DIFFMM_SPMM=dual|two_pass`` — dense-form fused dual-direction kernel
    opt-in (ops/graph.py; measured loss vs two_pass recorded there).
  * ``DIFFMM_DATA_ROOT`` / ``DIFFMM_FEAT_CACHE`` / ``DIFFMM_SYNTH_MODE`` —
    dataset root, SVD feature cache location (0 disables), and a loud
    synthesis-mode override for sweep A/B probes (data/loader.py).
"""

from __future__ import annotations

import ast
import dataclasses
import tomllib
from dataclasses import dataclass, field
from typing import Any


@dataclass
class BaseConfig:
    """Reference `Conf.py:9-17`."""

    latdim: int = 64
    topk: int = 20
    gpu: str = "0"  # accepted for config-compat; device placement is JAX's job
    seed: int = 8888
    denoise_dim: str = "[1024]"
    d_emb_size: int = 10
    cl_method: int = 0
    # TPU-specific: denoiser forward implementation for the no-grad reverse
    # sampling path. "auto"/"xla" use the XLA forward (measured equal to the
    # fused kernel on v5e — XLA already fuses this MLP); "pallas" opts into
    # the fused Pallas kernel (single-hidden-layer configs only).
    denoiser_impl: str = "auto"
    # TPU-specific: storage dtype of the denoiser parameters (and their Adam
    # moments). "bf16" halves the HBM traffic of the wide catalog-dim layers
    # in phases 1+2; measured A/B in DESIGN.md — the default stays f32.
    denoise_param_dtype: str = "f32"

    def denoise_dims(self) -> list[int]:
        """Hidden widths of the denoiser MLP (reference `Main.py:97`)."""
        if isinstance(self.denoise_dim, str):
            dims = ast.literal_eval(self.denoise_dim)
        else:
            dims = list(self.denoise_dim)
        if not isinstance(dims, list) or not all(isinstance(d, int) for d in dims):
            raise ValueError(f"denoise_dim must parse to a list of ints, got {dims!r}")
        return dims


@dataclass
class DataConfig:
    """Reference `Conf.py:19-27`. Shape fields are filled at load time."""

    name: str = "tiktok"
    user_num: int = 0
    item_num: int = 0
    image_feat_dim: int = 0
    text_feat_dim: int = 0
    audio_feat_dim: int = 0
    # Graceful degradation for unshipped feature blobs: "zeros" (default)
    # keeps the modality with zero features; "drop" trains without it
    # (fewer denoisers/graphs); "randn" uses fixed gaussian pseudo-features;
    # "svd" uses item co-occurrence directions of the train matrix (real
    # collaborative signal in place of the missing content embedding).
    missing_modalities: str = "zeros"
    # Rank cap for the svd/svd_tfidf synthesis modes (0 = the blob's full
    # documented dim). Small ranks keep only the leading co-occurrence
    # directions — a regularizer and much cheaper to decompose: on baby,
    # svd_tfidf rank 32 reproduces the full-rank 5-seed band
    # (0.0910-0.0929 vs 0.0911-0.0940, sweeps/baby_r5_seed_tfidf32.json)
    # at ~1/100th the Lanczos cost.
    synth_svd_rank: int = 0


@dataclass
class HyperConfig:
    """Reference `Conf.py:29-48`."""

    modal_cl_temp: float = 0.5
    modal_cl_rate: float = 0.01
    cross_cl_temp: float = 0.2
    cross_cl_rate: float = 0.2
    noise_degree: float = 0.2

    noise_scale: float = 0.1
    noise_min: float = 0.0001
    noise_max: float = 0.02
    steps: int = 5

    sim_weight: float = 0.1
    residual_weight: float = 0.5
    modal_adj_weight: float = 0.2

    sampling_step: int = 0

    knn_topk: int = 10
    # Ablation (reference C15, commented out there): build the modality
    # graphs by prototype-cosine KNN instead of reverse diffusion.
    use_knn_adj: bool = False


@dataclass
class TrainConfig:
    """Reference `Conf.py:50-59`."""

    lr: float = 0.001
    batch: int = 1024
    test_batch: int = 256
    reg: float = 1e-5
    epoch: int = 50
    tstEpoch: int = 1
    gnn_layer: int = 1
    use_lr_scheduler: bool = True
    # TPU-specific: graph propagation form — "auto" picks the dense MXU
    # matmul path while the interaction blocks fit an HBM budget,
    # otherwise segment-sum SpMM; "dense"/"sparse" force one.
    graph_form: str = "auto"
    # Blocks budget (GiB) for the "auto" dense/sparse decision. 0 = derive
    # from the device (train/coach.py::dense_graph_budget_bytes: 0.6 ×
    # bytes_limit − the estimated resident state; 4 GiB fallback where
    # memory_stats is unavailable — which includes THIS environment's
    # tunnel backend, whose memory_stats() is None). Set it when you know
    # the chip: on a 16 GiB v5e, yelp scale (38,403×20,000; 4.61 GiB of
    # blocks + ~2.3 GiB state) measured 10.85 s/epoch dense vs 23.7 sparse
    # (2.2×, round 5, sweeps/scale_probe_r5_yelp_*.json) — the stats-less
    # fallback alone would run it sparse.
    dense_budget_gb: float = 0.0
    # Storage dtype of the dense 0/1 interaction blocks. "int8" (default)
    # halves the HBM bytes of the workload's dominant operand — measured
    # 0.585 vs 0.737 s/epoch (1.26x) on v5e/tiktok, with the int8->bf16
    # convert fused into the matmuls (no materialized copy). Op-for-op the
    # math is identical (0/1 exact in every option), but XLA may schedule
    # reductions differently across compiles, so long training trajectories
    # vary within the usual seed-level band. "bf16" opts out; "int4" packs
    # two cells per HBM byte (exact too — measured A/B in DESIGN.md).
    dense_store: str = "int8"
    # Membership representation of the train interactions (diffusion rows,
    # negative-sampling tests, eval masks). "dense" keeps the (U, I) int8
    # matrix the reference materializes (`DataHandler.py:128`) — right while
    # it fits HBM: row reads are contiguous. "csr" holds ONLY the O(nnz)
    # user-major CSR view (aliasing the edge arrays already on device — zero
    # extra memory) and materializes each block's rows in-program
    # (data/membership.py; bit-identical rows/bits, so trajectories are
    # exactly interchangeable — tests/test_membership.py). "auto" follows
    # the graph form: dense with the dense MXU graphs, csr on the sparse
    # form — so a sparse-form run carries NO O(U·I) array anywhere, host or
    # device (the web-scale contract; VERDICT r4 #1).
    train_store: str = "auto"
    # Rebuild top-k implementation. "approx" = lax.approx_max_k with
    # recall_target=1.0 (the TPU PartialReduce custom call, measured 2.9 vs
    # 3.7 ms for lax.top_k at tiktok shape): identical VALUES and
    # value-sorted output, index order differs only on exact float ties —
    # where the reference's torch.topk order is unspecified too. "exact"
    # keeps lax.top_k.
    rebuild_topk: str = "approx"
    # Compute dtype of the phase-2 reverse-diffusion denoiser MLPs (the
    # rebuild is no-grad graph GENERATION — its output is consumed only
    # through per-user top-k, so sub-f32 matmul noise can at most reorder
    # near-tied candidates). "bf16" runs the reverse MLPs on the MXU's
    # bf16 path (f32 accumulation); training (phase 1, autodiff) always
    # stays f32. Measured A/B + accuracy band in DESIGN.md §2c.
    rebuild_compute: str = "f32"
    # User iteration order of the phase-2 rebuild. "degree" visits users in
    # degree-descending order so the per-block top-k width shrinks from the
    # GLOBAL max degree to each block's own max — on power-law datasets all
    # but the first block run a tiny top-k (tiktok: k=603 for 1 of 10
    # blocks, k=4 for the rest; top-k at (1024, 6710) measured 2.8 ms at
    # k=603 vs ~0.02 ms at k=4 on v5e). Semantics: the rebuild computes
    # each user's row independently, so order changes ONLY which q-sample
    # noise draw a user receives (and nothing at all at sampling_step=0);
    # the reference's own rebuild order is a shuffle=True DataLoader
    # (reference DataHandler.py:129, Main.py:211), i.e. arbitrary.
    # "identity" keeps the round-2 order for bit-exact continuity with
    # earlier checkpoints/trajectories.
    rebuild_order: str = "identity"
    # Compute dtype of the sparse form's per-edge MESSAGES on the planned
    # MXU reduction paths (sorted/rank-space/sharded segment-sum kernels).
    # "bf16" rounds the gathered messages once and runs the one-hot dot at
    # the MXU's bf16 rate with f32 accumulation — the SAME rounding policy
    # the dense graph form applies to its embedding operand at every
    # propagation matmul (ops/graph.py::_spmm_bi_dense), so sparse and
    # dense share one precision story. The XLA-scatter fallback always
    # accumulates f32. "f32" keeps the round-3 bit-exact kernels.
    segsum_compute: str = "f32"
    # Sparse form: run the M modality graphs' shared-layout reductions as
    # single wide (M*latdim) kernel calls instead of M separate ones —
    # the rebuilt graphs all keep the train-row layout (ops/topk.py), so
    # the per-call fixed cost amortizes across the stacked width. Measured
    # 0.581 -> 0.353 ms for tiktok's modal trio (d 64 -> 192,
    # sweeps/stacked_probe_r5.json). Reduction ORDER inside the wide call
    # differs from the per-modality calls like any replan does, so set
    # false to reproduce pre-round-5 sparse trajectories bit-exactly.
    stack_modal: bool = True
    # TPU-specific: number of consecutive training epochs fused into ONE
    # compiled program (a lax.scan over epochs). Each dispatch crosses the
    # host->device boundary (~28 ms round-trip over this environment's
    # tunnel) and the single-epoch path needs several per epoch; fusing E
    # epochs amortizes that to ~1/E. The RNG stream advances exactly as the
    # single-epoch path (same split order, same host permutation draws), so
    # the trajectory is the same program order-of-operations aside. Eval
    # epochs fuse too: the ranking eval runs in-program under lax.cond on
    # each tstEpoch boundary with best-model tracking in the scan carry
    # (reference Main.py:71-78 selection semantics), so any cadence works —
    # tstEpoch=1 included. run() fuses only EXACT scan-length windows with
    # no interior checkpoint boundary (every distinct chunk length is a
    # fresh XLA compile — a one-off tail chunk measured 37 s on the tunnel
    # vs ~0.05 s/epoch saved); shrunk windows run single-epoch. 1 disables.
    epoch_scan: int = 1
    # TPU-specific: donate the consumed-and-replaced state buffers (params +
    # Adam moments, and the fused path's carry) to their update programs so
    # XLA aliases input and output instead of holding both across the step
    # boundary. Training state is the only per-catalog-row allocation with
    # THREE copies (params, m, v); without donation its peak doubles to six
    # at every phase dispatch. Safe because Coach reassigns the state from
    # the program outputs and never touches the old arrays (checkpoint saves
    # snapshot to host before returning). Off restores round-2 behavior.
    donate_buffers: bool = True


@dataclass
class Config:
    base: BaseConfig = field(default_factory=BaseConfig)
    data: DataConfig = field(default_factory=DataConfig)
    hyper: HyperConfig = field(default_factory=HyperConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


# legacy key -> (section-local new key | None to drop)
_LEGACY_ALIASES: dict[str, str | None] = {
    "sampling_steps": "sampling_step",
    "e_loss": "sim_weight",
    "keepRate": None,
    "trans": None,
    "rebuild_k": None,
    "norm": None,
    "sampling_noise": None,
}


def _filter_section(cls: type, raw: dict[str, Any], strict: bool) -> dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    out: dict[str, Any] = {}
    for key, value in raw.items():
        if key in names:
            out[key] = value
            continue
        if key in _LEGACY_ALIASES:
            mapped = _LEGACY_ALIASES[key]
            if mapped is not None and mapped in names and mapped not in raw:
                out[mapped] = value
            continue
        if strict:
            raise ValueError(f"Unknown config key {key!r} for section {cls.__name__}")
    return out


def load_config(path: str, strict: bool = False) -> Config:
    """Load a TOML config, tolerating the reference's legacy keys.

    Reference `Conf.py:69-77` (which is strict and therefore rejects three of
    the six shipped tomls — schema drift documented in SURVEY.md §2.2).
    """
    with open(path, "rb") as fh:
        raw = tomllib.load(fh)
    return config_from_dict(raw, strict=strict)


def config_from_dict(raw: dict[str, Any], strict: bool = False) -> Config:
    return Config(
        base=BaseConfig(**_filter_section(BaseConfig, raw.get("base", {}), strict)),
        data=DataConfig(**_filter_section(DataConfig, raw.get("data", {}), strict)),
        hyper=HyperConfig(**_filter_section(HyperConfig, raw.get("hyper", {}), strict)),
        train=TrainConfig(**_filter_section(TrainConfig, raw.get("train", {}), strict)),
    )


def config_to_dict(config: Config) -> dict[str, Any]:
    return dataclasses.asdict(config)


def resolve_field(config: Config, qual: str) -> tuple[Any, str]:
    """``'hyper.steps'`` / ``'train.lr'`` / bare ``'steps'`` (hyper section
    by default; bare ``'seed'`` maps to base.seed) -> (section object,
    field name). The one override spelling shared by ``tools/sweep.py
    --set``, ``bench.py BENCH_SET`` and the CLI ``--set``."""
    section, _, key = qual.rpartition(".")
    if not section and key == "seed":
        section = "base"
    obj = getattr(config, section, None) if section else config.hyper
    if obj is None or not hasattr(obj, key):
        raise ValueError(f"unknown config field {qual!r}")
    return obj, key


def cast_field(caster: type, raw: Any) -> Any:
    """Cast an override string to a config field's type; bool gets real
    parsing (``bool('False')`` is True — the default caster would mangle
    flags)."""
    if caster is bool and isinstance(raw, str):
        low = raw.strip().lower()
        if low in ("true", "1", "yes", "on"):
            return True
        if low in ("false", "0", "no", "off"):
            return False
        raise ValueError(f"not a boolean: {raw!r}")
    return caster(raw)


def apply_overrides(config: Config, overrides: list[str]) -> Config:
    """Apply ``'section.key=value'`` strings in order (later wins)."""
    for item in overrides:
        qual, sep, raw = item.partition("=")
        if not sep:
            raise ValueError(f"override must be key=value, got {item!r}")
        obj, key = resolve_field(config, qual)
        setattr(obj, key, cast_field(type(getattr(obj, key)), raw))
    return config
