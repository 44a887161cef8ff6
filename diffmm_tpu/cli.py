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
    args = parser.parse_args(argv)

    try:
        config = load_config(args.config)
        print(f"Load configuration ({config.data.name}) file successfully👌")
    except Exception as e:  # reference Main.py:463-468
        print(f"Error loading configuration file: {e}")
        return 1

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

    coach = Coach(config, host, log=log)
    best = coach.run(epochs=args.epochs)
    log.info(
        f"Best epoch: {best['best_epoch']}, Recall: {best['Recall']:.5f}, "
        f"NDCG: {best['NDCG']:.5f}, Precision: {best['Precision']:.5f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
