"""Render benchmark/results.csv as an SVG of throughput over commits.

Stdlib-only (csv + hand-written SVG) so it runs anywhere the repo does.
Mirrors the role of the reference's benchmark/make_plots.jl (which plots
NC-bin counts per dataset per version) for the TPU build's driver metrics.

Usage: python benchmark/plot.py [outfile.svg]
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict
from pathlib import Path

HERE = Path(__file__).parent

PLOTTED = [
    ("cluster_clusters_per_s_1M", "clusters/s @ 1M×32", "#4053d3"),
    ("vae_train_contigs_per_s_chip", "VAE contigs/s/chip", "#ddb310"),
]

W, H, PAD = 760, 300, 56


def load(path: Path) -> dict[str, list[tuple[str, float]]]:
    series: dict[str, list[tuple[str, float]]] = defaultdict(list)
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            series[row["metric"]].append((row["commit"], float(row["value"])))
    return series


def panel(x0: float, name: str, label: str, color: str,
          pts: list[tuple[str, float]]) -> list[str]:
    pw = (W - 3 * PAD) / 2
    top, bot = PAD, H - PAD
    vmax = max(v for _, v in pts) * 1.15 or 1.0
    out = [
        f'<rect x="{x0}" y="{top}" width="{pw}" height="{bot - top}" '
        'fill="none" stroke="#bbb"/>',
        f'<text x="{x0 + pw / 2}" y="{top - 10}" text-anchor="middle" '
        f'font-size="13" fill="#333">{label}</text>',
    ]
    n = len(pts)
    step = pw / max(n, 1)
    for i, (commit, val) in enumerate(pts):
        cx = x0 + step * (i + 0.5)
        bh = (bot - top) * val / vmax
        out.append(
            f'<rect x="{cx - step * 0.3}" y="{bot - bh}" width="{step * 0.6}" '
            f'height="{bh}" fill="{color}"/>'
        )
        out.append(
            f'<text x="{cx}" y="{bot + 14}" text-anchor="middle" '
            f'font-size="9" fill="#555">{commit[:7]}</text>'
        )
        out.append(
            f'<text x="{cx}" y="{bot - bh - 4}" text-anchor="middle" '
            f'font-size="9" fill="#333">{val:.3g}</text>'
        )
    return out


def main() -> None:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else HERE / "benchmark.svg"
    series = load(HERE / "results.csv")
    body = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}" font-family="sans-serif">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
    ]
    pw = (W - 3 * PAD) / 2
    for i, (name, label, color) in enumerate(PLOTTED):
        pts = series.get(name)
        if pts:
            body += panel(PAD + i * (pw + PAD), name, label, color, pts)
    body.append("</svg>")
    out_path.write_text("\n".join(body))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
