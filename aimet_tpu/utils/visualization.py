"""Weight-range and calibration-histogram visualization (self-contained
HTML/SVG — replaces the reference's bokeh stack: visualize_model.py,
bokeh_plots.py, plotting_utils.py)."""
from __future__ import annotations

import html
from typing import Dict, List, Optional, Sequence

import numpy as np
from jax import tree_util as jtu


def _svg_range_plot(names, mins, maxs, width=720, row_h=18):
    lo = min(mins)
    hi = max(maxs)
    span = max(hi - lo, 1e-9)
    x0, plot_w = 220, width - 240
    rows = []
    for i, (n, mn, mx) in enumerate(zip(names, mins, maxs)):
        y = 20 + i * row_h
        bx = x0 + (mn - lo) / span * plot_w
        bw = max((mx - mn) / span * plot_w, 1)
        rows.append(
            f'<text x="4" y="{y + 12}" font-size="11">{html.escape(n[:34])}</text>'
            f'<rect x="{bx:.1f}" y="{y + 3}" width="{bw:.1f}" height="10" '
            f'fill="#4a90d9" opacity="0.8"/>')
    h = 30 + len(names) * row_h
    zero_x = x0 + (0 - lo) / span * plot_w
    axis = (f'<line x1="{zero_x:.1f}" y1="12" x2="{zero_x:.1f}" y2="{h - 6}" '
            f'stroke="#c33" stroke-dasharray="3,3"/>' if lo <= 0 <= hi else "")
    return (f'<svg width="{width}" height="{h}" '
            f'xmlns="http://www.w3.org/2000/svg">{axis}{"".join(rows)}</svg>')


def visualize_weight_ranges(params, path: str, channel_axis: int = -1):
    """Per-layer weight min/max bars (visualize_model.py equivalent)."""
    names, mins, maxs = [], [], []
    for p, leaf in jtu.tree_flatten_with_path(params)[0]:
        name = jtu.keystr(p)
        if "kernel" not in name and "embedding" not in name:
            continue
        arr = np.asarray(leaf)
        names.append(name)
        mins.append(float(arr.min()))
        maxs.append(float(arr.max()))
    svg = _svg_range_plot(names, mins, maxs)
    with open(path, "w") as f:
        f.write(f"<!doctype html><html><body><h1>Weight ranges</h1>{svg}"
                f"</body></html>")


def visualize_encoding_ranges(sim, path: str):
    """Encoding min/max per quantizer."""
    names, mins, maxs = [], [], []
    for name, enc in sim.encodings.items():
        names.append(name)
        mins.append(float(np.asarray(enc.min).min()))
        maxs.append(float(np.asarray(enc.max).max()))
    svg = _svg_range_plot(names, mins, maxs)
    with open(path, "w") as f:
        f.write(f"<!doctype html><html><body><h1>Encoding ranges</h1>{svg}"
                f"</body></html>")


def visualize_calibration_histograms(sim, path: str, max_plots: int = 32):
    """Calibration PDFs per activation quantizer (requires retained observer
    state from compute_encodings)."""
    obs = getattr(sim, "_obs_states", None)
    if obs is None:
        raise RuntimeError("run compute_encodings first")
    blocks = []
    for name, st in list(obs.items())[:max_plots]:
        if not hasattr(st, "pdf"):
            continue
        pdf = np.asarray(st.pdf)
        xleft = np.asarray(st.xleft)
        peak = pdf.max() or 1.0
        pts = " ".join(
            f"{10 + i * 1.2:.1f},{60 - 55 * p / peak:.1f}"
            for i, p in enumerate(pdf))
        blocks.append(
            f"<div><b>{html.escape(name)}</b> "
            f"[{xleft[0]:.3g}, {xleft[-1]:.3g}]<br>"
            f'<svg width="640" height="64"><polyline points="{pts}" '
            f'fill="none" stroke="#4a90d9"/></svg></div>')
    with open(path, "w") as f:
        f.write("<!doctype html><html><body><h1>Calibration histograms</h1>"
                + "".join(blocks) + "</body></html>")
