"""Render the accuracy-grid trade-off curves as SVG plots, mirroring
the reference's checked-in plots/*.svg (examples/accuracy.rs:946-1869:
err_vs_mem_usage_* and mem_vs_input_size) for this library.

matplotlib is not available in this container, so the charts are
written as plain SVG — log-log line charts with one axis each, fixed
categorical series colors (validated palette), direct labels + legend,
and the numeric table view in ACCURACY.md as the accessible fallback.

Run: python tools/plot_accuracy.py   (writes plots/*.svg)
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from sketchlib.core.kll import KLL  # noqa: E402
from sketchlib.core.oracle import LinearOracle  # noqa: E402
from sketchlib.core.rc_sketch import RCSketch  # noqa: E402
from sketchlib.core.tdigest import TDigest  # noqa: E402
from tests.conftest import make_values  # noqa: E402

# categorical slots 1-3 of the validated default palette (dataviz
# reference instance; CVD + normal-vision checks pass, contrast WARN
# mitigated by direct labels + the ACCURACY.md table view)
SERIES_COLORS = ["#2a78d6", "#eb6834", "#1baf7a"]
SURFACE = "#fcfcfb"
INK = "#1a1a18"
MUTED = "#6b6b66"
GRID = "#e4e4e0"

W, H = 640, 420
ML, MR, MT, MB = 70, 140, 44, 52  # right margin holds direct labels


def _log_ticks(lo: float, hi: float) -> list[float]:
    """Powers of 10 spanning [lo, hi]."""
    a = math.floor(math.log10(lo))
    b = math.ceil(math.log10(hi))
    return [10.0**e for e in range(a, b + 1)]


def _fmt(v: float) -> str:
    if v >= 1e6:
        return f"{v/1e6:g}M"
    if v >= 1e3:
        return f"{v/1e3:g}k"
    if v >= 1:
        return f"{v:g}"
    e = round(math.log10(v))
    return f"1e{e}"


def svg_loglog(
    series: list[tuple[str, list[float], list[float]]],
    title: str,
    xlabel: str,
    ylabel: str,
) -> str:
    """One log-log line chart: 2px polylines, 8px markers, recessive
    decade grid, legend + direct labels at line ends, single axis."""
    xs_all = [x for _, xs, _ in series for x in xs]
    ys_all = [y for _, _, ys in series for y in ys]
    x0, x1 = min(xs_all), max(xs_all)
    y0, y1 = min(ys_all), max(ys_all)
    # pad the y domain a decade-fraction so marks clear the frame
    ly0, ly1 = math.log10(y0) - 0.15, math.log10(y1) + 0.15
    lx0, lx1 = math.log10(x0) - 0.05, math.log10(x1) + 0.05

    def X(v: float) -> float:
        return ML + (math.log10(v) - lx0) / (lx1 - lx0) * (W - ML - MR)

    def Y(v: float) -> float:
        return H - MB - (math.log10(v) - ly0) / (ly1 - ly0) * (H - MT - MB)

    p: list[str] = []
    p.append(
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}" font-family="system-ui, sans-serif">'
    )
    p.append(f'<rect width="{W}" height="{H}" fill="{SURFACE}"/>')
    p.append(
        f'<text x="{ML}" y="24" fill="{INK}" font-size="15" '
        f'font-weight="600">{title}</text>'
    )
    # recessive decade grid + ticks
    for tv in _log_ticks(x0, x1):
        if not (10**lx0 <= tv <= 10**lx1):
            continue
        x = X(tv)
        p.append(
            f'<line x1="{x:.1f}" y1="{MT}" x2="{x:.1f}" y2="{H-MB}" '
            f'stroke="{GRID}" stroke-width="1"/>'
        )
        p.append(
            f'<text x="{x:.1f}" y="{H-MB+18}" fill="{MUTED}" font-size="11" '
            f'text-anchor="middle">{_fmt(tv)}</text>'
        )
    for tv in _log_ticks(y0, y1):
        if not (10**ly0 <= tv <= 10**ly1):
            continue
        y = Y(tv)
        p.append(
            f'<line x1="{ML}" y1="{y:.1f}" x2="{W-MR}" y2="{y:.1f}" '
            f'stroke="{GRID}" stroke-width="1"/>'
        )
        p.append(
            f'<text x="{ML-8}" y="{y+4:.1f}" fill="{MUTED}" font-size="11" '
            f'text-anchor="end">{_fmt(tv)}</text>'
        )
    # axis labels
    p.append(
        f'<text x="{(ML+W-MR)/2:.0f}" y="{H-10}" fill="{MUTED}" '
        f'font-size="12" text-anchor="middle">{xlabel}</text>'
    )
    p.append(
        f'<text x="16" y="{(MT+H-MB)/2:.0f}" fill="{MUTED}" font-size="12" '
        f'text-anchor="middle" transform="rotate(-90 16 {(MT+H-MB)/2:.0f})">'
        f"{ylabel}</text>"
    )
    # series: 2px lines, 8px (r=4) markers with a 2px surface ring,
    # direct label at the line end; fixed slot order, never cycled
    label_ys: list[float] = []
    legend_bottom = MT + 4 + len(series) * 18
    for i, (name, xs, ys) in enumerate(series):
        c = SERIES_COLORS[i]
        pts = sorted(zip(xs, ys))
        path = " ".join(f"{X(x):.1f},{Y(y):.1f}" for x, y in pts)
        p.append(
            f'<polyline points="{path}" fill="none" stroke="{c}" '
            f'stroke-width="2" stroke-linejoin="round"/>'
        )
        for x, y in pts:
            p.append(
                f'<circle cx="{X(x):.1f}" cy="{Y(y):.1f}" r="4" '
                f'fill="{c}" stroke="{SURFACE}" stroke-width="2"/>'
            )
        ex, ey = pts[-1]
        # collision avoidance: keep end labels below the legend block
        # and >= 15px from each other
        ly = max(Y(ey) + 4, legend_bottom + 12)
        while any(abs(ly - prev) < 15 for prev in label_ys):
            ly += 15
        label_ys.append(ly)
        p.append(
            f'<text x="{X(ex)+10:.1f}" y="{ly:.1f}" fill="{INK}" '
            f'font-size="11">{name}</text>'
        )
    # legend (top-right, inside the right margin)
    for i, (name, _, _) in enumerate(series):
        y = MT + 4 + i * 18
        p.append(
            f'<rect x="{W-MR+6}" y="{y-9}" width="12" height="12" rx="3" '
            f'fill="{SERIES_COLORS[i]}"/>'
        )
        p.append(
            f'<text x="{W-MR+24}" y="{y+2}" fill="{INK}" font-size="11">'
            f"{name}</text>"
        )
    p.append("</svg>")
    return "\n".join(p)


def err_vs_mem() -> str:
    """Mean mid-quantile rank error vs serialized bytes, parameter
    sweep per family on uniform n=1e6 (accuracy.rs:946-974)."""
    n = 1_000_000
    values = make_values("uniform", n)
    oracle = LinearOracle(values)
    mid = np.array([0.25, 0.5, 0.75])
    sweep = [
        ("t-digest (delta sweep)",
         [lambda d=d: TDigest(delta=d) for d in (16, 64, 256, 1024, 4096, 8192)]),
        ("KLL (k sweep)", [lambda k=k: KLL(k=k) for k in (8, 32, 128, 512)]),
        ("RCSketch (k sweep)",
         [lambda k=k: RCSketch(input_length=n, k=k) for k in (8, 50, 200)]),
    ]
    series = []
    for name, makes in sweep:
        xs, ys = [], []
        for make in makes:
            sk = make()
            sk.add_buffer(values)
            est = np.atleast_1d(sk.value_at_quantile(mid))
            err = float(np.mean([
                abs(oracle.quantile_at_value(float(e)) - q)
                for e, q in zip(est, mid)
            ]))
            xs.append(float(sk.owned_size()))
            ys.append(max(err, 1e-7))  # log axis floor
        series.append((name, xs, ys))
    return svg_loglog(
        series,
        "Rank error vs sketch memory (uniform, n=1e6)",
        "serialized state (bytes)",
        "mean rank error, q in {0.25, 0.5, 0.75}",
    )


def mem_vs_input() -> str:
    """Serialized bytes vs input size n (accuracy.rs:1766-1869:
    RC k=20, RCSketch2/KLL k=20, t-digest delta=6000)."""
    ns = [2**e for e in (10, 13, 16, 19, 22)]
    series = []
    for name, make in (
        ("t-digest d=6000", lambda n: TDigest(delta=6000)),
        ("KLL k=20", lambda n: KLL(k=20)),
        ("RCSketch k=20", lambda n: RCSketch(input_length=n, k=20)),
    ):
        xs, ys = [], []
        for n in ns:
            sk = make(n)
            sk.add_buffer(make_values("uniform", n))
            _ = sk.value_at_quantile(0.5)  # force flush/compaction
            xs.append(float(n))
            ys.append(float(sk.owned_size()))
        series.append((name, xs, ys))
    return svg_loglog(
        series,
        "Sketch memory vs input size (uniform)",
        "input size n (values)",
        "serialized state (bytes)",
    )


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plots")
    os.makedirs(out_dir, exist_ok=True)
    for fname, fn in (
        ("err_vs_mem.svg", err_vs_mem),
        ("mem_vs_input_size.svg", mem_vs_input),
    ):
        svg = fn()
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(svg)
        print(f"wrote plots/{fname}")


if __name__ == "__main__":
    main()
