"""Render sweep results to a figure — the script equivalent of the
reference's sensitivity plots (`notebooks/visualization.ipynb` cells 1-2,
which chart tiktok Recall/NDCG across sampling_step values).

Accepts any JSON written by tools/sweep.py (single-param, forked, or
coordinate-descent plan files) and renders one row of small multiples per
swept parameter: Recall@20 and NDCG@20 against the parameter's values,
best point direct-labeled.

  python tools/plot_sweeps.py sweeps/sweep_r2_noise_degree.json sweeps/sweep_r2_plan.json \
      --out figures/sweeps.png
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# One series per panel: a single mid-lightness hue; text/grid stay in ink
# tokens (never the series color).
LINE = "#3b6ecc"
INK = "#30302e"
MUTED = "#87867f"


def _groups(path: str):
    """Yield (title, param, rows) per swept parameter in a sweep JSON."""
    with open(path) as fh:
        doc = json.load(fh)
    base = os.path.basename(path)
    if "legs" in doc:  # coordinate-descent plan file
        for leg in doc["legs"]:
            yield f"{base}: {leg['param']}", leg["param"], leg["results"]
    else:  # single-param / forked file
        yield f"{base}: {doc['param']}", doc["param"], doc["results"]


def _panel(ax, xs, ys, xlabel, ylabel):
    numeric = all(isinstance(x, (int, float)) for x in xs)
    pos = xs if numeric else range(len(xs))
    ax.plot(pos, ys, color=LINE, linewidth=2, marker="o", markersize=6)
    if not numeric:
        ax.set_xticks(list(pos))
        ax.set_xticklabels([str(x) for x in xs])
    best = max(range(len(ys)), key=ys.__getitem__)
    ax.annotate(
        f"{ys[best]:.4f}",
        (list(pos)[best], ys[best]),
        textcoords="offset points", xytext=(0, 8),
        ha="center", fontsize=9, color=INK,
    )
    ax.margins(y=0.2)  # headroom so the best-point label clears the title
    ax.set_xlabel(xlabel, color=INK)
    ax.set_ylabel(ylabel, color=INK)
    ax.grid(True, alpha=0.25, linewidth=0.5)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    ax.tick_params(colors=MUTED)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("paths", nargs="+", help="sweep JSON files")
    parser.add_argument("--out", default="sweeps.png")
    args = parser.parse_args(argv)

    groups = [g for path in args.paths for g in _groups(path)]
    if not groups:
        raise SystemExit("no sweep results found")

    fig, axes = plt.subplots(
        len(groups), 2, figsize=(9, 2.8 * len(groups)), squeeze=False
    )
    for (title, param, rows), (ax_r, ax_n) in zip(groups, axes):
        rows = [r for r in rows if "Recall" in r]  # skip failed forked runs
        ax_r.set_title(title, loc="left", fontsize=10, color=INK)
        if not rows:
            for ax in (ax_r, ax_n):
                ax.text(0.5, 0.5, "no successful runs", ha="center",
                        va="center", color=MUTED, transform=ax.transAxes)
                ax.set_xticks([]), ax.set_yticks([])
            continue
        xs = [r[param] for r in rows]
        _panel(ax_r, xs, [r["Recall"] for r in rows], param, "Recall@20")
        _panel(ax_n, xs, [r["NDCG"] for r in rows], param, "NDCG@20")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out} ({len(groups)} parameter panels)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
