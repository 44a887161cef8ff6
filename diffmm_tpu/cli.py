"""CLI driver: ``python -m diffmm_tpu -c conf/test.toml``.

Parity target: reference `Main.py:459-487` — parse config path (default
``conf/test.toml``), seed, echo config, load data, run the Coach.
"""

from __future__ import annotations

import argparse
import dataclasses

from diffmm_tpu.config import load_config
from diffmm_tpu.data.loader import load_host_data
from diffmm_tpu.train.coach import Coach
from diffmm_tpu.utils.logging import Log


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="diffmm_tpu trainer")
    parser.add_argument(
        "--config", "-c", default="conf/test.toml", help="config file path"
    )
    parser.add_argument("--data-root", default=None, help="dataset root directory")
    parser.add_argument("--epochs", type=int, default=None, help="override epoch count")
    parser.add_argument(
        "--checkpoint-dir",
        default=None,
        help="save/resume full training state here (orbax)",
    )
    parser.add_argument(
        "--checkpoint-every",
        type=int,
        default=10,
        help="epochs between checkpoint saves (full state is hundreds of MB; "
        "saving every sub-second epoch dominates wall time)",
    )
    parser.add_argument(
        "--mesh",
        default=None,
        metavar="DATAxMODEL",
        help="shard over a device mesh, e.g. 4x2 (data=4, model=2)",
    )
    parser.add_argument(
        "--trace-dir",
        default=None,
        help="write a jax.profiler trace here (view with TensorBoard/xprof)",
    )
    parser.add_argument(
        "--eval-split",
        default="test",
        choices=("test", "val"),
        help="ranking-eval split (val needs a shipped valMat.pkl)",
    )
    parser.add_argument(
        "--export-index",
        default=None,
        metavar="PATH",
        help="after training, save a serving index (embeddings + mask) here",
    )
    parser.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="SECTION.KEY=VALUE",
        help="config override, e.g. --set train.epoch_scan=5 --set "
        "hyper.noise_degree=1.0 (bare keys default to [hyper]; repeatable, "
        "later wins — same spelling as tools/sweep.py)",
    )
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: call jax.distributed.initialize() before anything "
        "else (coordinator/process env per JAX's standard variables); the "
        "mesh then spans all hosts' devices over ICI/DCN",
    )
    args = parser.parse_args(argv)

    if args.distributed:
        import os

        import jax

        # Bare initialize() only auto-detects known cluster launchers (TPU
        # pods, SLURM, ...). Generic launchers set JAX's standard variables
        # explicitly — honor them so `--distributed` works anywhere.
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if coord and nproc is not None and pid is not None:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        else:
            jax.distributed.initialize()

    try:
        config = load_config(args.config)
        print(f"Load configuration ({config.data.name}) file successfully👌")
    except Exception as e:  # reference Main.py:463-468
        print(f"Error loading configuration file: {e}")
        return 1
    if args.set:
        from diffmm_tpu.config import apply_overrides

        try:
            apply_overrides(config, args.set)
        except ValueError as e:
            parser.error(str(e))

    log = Log("main", config.data.name)
    log.info("Start")
    log.info("Configuration Details:")
    for section_field in dataclasses.fields(config):
        section = getattr(config, section_field.name)
        log.info(f"[{section_field.name}]")
        for f in dataclasses.fields(section):
            log.info(f"  {f.name}: {getattr(section, f.name)}")

    log.info("Load Data")
    host = load_host_data(config, data_root=args.data_root)

    mesh = None
    if args.mesh:
        from diffmm_tpu.parallel import make_mesh

        data_sz, model_sz = (int(v) for v in args.mesh.lower().split("x"))
        mesh = make_mesh(data_sz * model_sz, model_parallel=model_sz)
        log.info(f"Mesh: data={data_sz}, model={model_sz}")

    coach = Coach(
        config, host, log=log, mesh=mesh, checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
    )
    from diffmm_tpu.utils.profiling import trace

    with trace(args.trace_dir):
        best = coach.run(epochs=args.epochs, eval_split=args.eval_split)
    log.info(
        f"Best epoch: {best['best_epoch']}, Recall: {best['Recall']:.5f}, "
        f"NDCG: {best['NDCG']:.5f}, Precision: {best['Precision']:.5f}"
    )
    if args.export_index:
        if coach.ensure_modal_adjs() is None and coach.best_snapshot is None:
            log.info(
                "⚠️ no trained epoch completed — skipping --export-index "
                "(the serving index needs the epoch's modality graphs)"
            )
        else:
            from diffmm_tpu.eval.serving import build_index, save_index

            save_index(build_index(coach), args.export_index)
            which = (
                f"best epoch {coach.best_snapshot['epoch']}"
                if coach.best_snapshot is not None
                else "final epoch"
            )
            log.info(
                f"Serving index ({which}) saved to {args.export_index} 📦"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
