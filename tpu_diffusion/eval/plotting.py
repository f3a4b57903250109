"""Publication plotting + protein visualization.

Rebuilds `amortised diffusion/src/evaluation/{plotstyle,plot_pipeline,
visualize}.py`: rc-param plot styling with LaTeX-textwidth figure sizing,
the distribution-comparison pipeline (per-statistic histograms, radar chart,
parallel coordinates) over sample_stats rows, and 3-D C-alpha structure /
trajectory rendering (GIFs via matplotlib's PillowWriter; the reference's
pymol renders have no pymol here).

All functions return matplotlib figures so they compose with
`MetricWriter.write_figures`.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

# LaTeX textwidths in inches (plotstyle.py:13-40)
TEXTWIDTHS = {"thesis": 5.9, "beamer": 4.8, "paper": 6.75}


def set_plotstyle(context: str = "paper"):
    """Publication rc params (plotstyle.py:41-266, no LaTeX engine here)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    plt.rcParams.update({
        "figure.figsize": (TEXTWIDTHS.get(context, 6.75), 3.2),
        "font.size": 9,
        "axes.titlesize": 9,
        "axes.labelsize": 8,
        "legend.fontsize": 7,
        "xtick.labelsize": 7,
        "ytick.labelsize": 7,
        "axes.spines.top": False,
        "axes.spines.right": False,
        "figure.dpi": 150,
        "savefig.bbox": "tight",
    })


def _numeric_columns(rows: List[Dict]) -> List[str]:
    cols = []
    for k in rows[0]:
        if k in ("id",):
            continue
        vals = [r.get(k) for r in rows]
        if all(isinstance(v, (int, float)) and np.isfinite(v)
               for v in vals if v is not None):
            cols.append(k)
    return cols


def distribution_comparison(sample_rows: List[Dict],
                            train_rows: Optional[List[Dict]] = None,
                            columns: Optional[Sequence[str]] = None):
    """Per-statistic histogram grid: samples vs training set
    (plot_pipeline.py:30-150)."""
    import matplotlib.pyplot as plt
    columns = list(columns or _numeric_columns(sample_rows))
    n = len(columns)
    ncol = min(4, max(n, 1))
    nrow = math.ceil(n / ncol)
    fig, axes = plt.subplots(nrow, ncol, figsize=(3 * ncol, 2.2 * nrow),
                             squeeze=False)
    for i, col in enumerate(columns):
        ax = axes[i // ncol][i % ncol]
        vals = [r[col] for r in sample_rows if col in r]
        ax.hist(vals, bins=20, alpha=0.6, density=True, label="samples")
        if train_rows:
            tvals = [r[col] for r in train_rows if col in r]
            if tvals:
                ax.hist(tvals, bins=20, alpha=0.5, density=True,
                        label="train")
        ax.set_title(col)
    for j in range(n, nrow * ncol):
        axes[j // ncol][j % ncol].axis("off")
    if train_rows:
        axes[0][0].legend()
    fig.tight_layout()
    return fig


def radar_chart(stats: Dict[str, float],
                reference: Optional[Dict[str, float]] = None):
    """Normalized radar/spider chart of summary stats
    (plot_pipeline.py radar)."""
    import matplotlib.pyplot as plt
    keys = sorted(k for k, v in stats.items()
                  if isinstance(v, (int, float)) and np.isfinite(v))
    if not keys:
        raise ValueError("no numeric stats to plot")
    angles = np.linspace(0, 2 * np.pi, len(keys), endpoint=False)
    scale = {k: max(abs(stats[k]),
                    abs(reference.get(k, 0.0)) if reference else 0.0, 1e-9)
             for k in keys}
    vals = [stats[k] / scale[k] for k in keys]
    fig, ax = plt.subplots(subplot_kw={"projection": "polar"},
                           figsize=(4.5, 4.5))
    ax.plot(np.append(angles, angles[0]), vals + [vals[0]],
            label="samples")
    ax.fill(np.append(angles, angles[0]), vals + [vals[0]], alpha=0.2)
    if reference:
        rvals = [reference.get(k, 0.0) / scale[k] for k in keys]
        ax.plot(np.append(angles, angles[0]), rvals + [rvals[0]],
                label="reference")
    ax.set_xticks(angles)
    ax.set_xticklabels(keys)
    ax.legend(loc="upper right", bbox_to_anchor=(1.3, 1.1))
    return fig


def parallel_coordinates(rows: List[Dict],
                         columns: Optional[Sequence[str]] = None,
                         color_by: Optional[str] = None):
    """Parallel-coordinates plot across statistics (plot_pipeline.py)."""
    import matplotlib.pyplot as plt
    columns = list(columns or _numeric_columns(rows))
    data = np.array([[r[c] for c in columns] for r in rows], float)
    lo = data.min(0)
    hi = np.maximum(data.max(0) - lo, 1e-9)
    norm = (data - lo) / hi
    fig, ax = plt.subplots(figsize=(1.2 * len(columns) + 2, 3.2))
    cvals = None
    if color_by and color_by in columns:
        cvals = norm[:, columns.index(color_by)]
    for i, row in enumerate(norm):
        color = plt.cm.viridis(cvals[i]) if cvals is not None else None
        ax.plot(range(len(columns)), row, alpha=0.4, color=color)
    ax.set_xticks(range(len(columns)))
    ax.set_xticklabels(columns, rotation=30, ha="right")
    ax.set_ylabel("normalized")
    fig.tight_layout()
    return fig


def plot_structure(coords: np.ndarray, title: str = ""):
    """3-D C-alpha trace (visualize.py quick_vis)."""
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(projection="3d")
    ax.plot(coords[:, 0], coords[:, 1], coords[:, 2], "-o", markersize=2,
            linewidth=1)
    ax.set_title(title)
    ax.set_axis_off()
    return fig


def trajectory_gif(trajectory: np.ndarray, path: str, fps: int = 10,
                   stride: int = 1):
    """Animate a [T, N, 3] reverse-diffusion trajectory to a GIF
    (visualize.py:14-179)."""
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter
    traj = trajectory[::stride]
    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(projection="3d")
    lim = float(np.nanmax(np.abs(traj))) or 1.0

    def frame(k):
        ax.clear()
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(-lim, lim)
        ax.set_axis_off()
        c = traj[k]
        ax.plot(c[:, 0], c[:, 1], c[:, 2], "-o", markersize=2, linewidth=1)
        ax.set_title(f"step {k * stride}")

    anim = FuncAnimation(fig, frame, frames=len(traj))
    anim.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return path


def run_plot_pipeline(sample_rows: List[Dict], out_dir: str,
                      train_rows: Optional[List[Dict]] = None,
                      summary: Optional[Dict[str, float]] = None):
    """Write the standard figure set (plot_pipeline.py:200-315)."""
    os.makedirs(out_dir, exist_ok=True)
    set_plotstyle()
    figs = {"distributions": distribution_comparison(sample_rows,
                                                     train_rows)}
    if summary:
        numeric = {k: v for k, v in summary.items()
                   if isinstance(v, (int, float)) and np.isfinite(v)}
        if numeric:
            figs["radar"] = radar_chart(numeric)
    if len(sample_rows) > 1:
        figs["parallel"] = parallel_coordinates(sample_rows)
    paths = {}
    for name, fig in figs.items():
        p = os.path.join(out_dir, f"{name}.png")
        fig.savefig(p)
        paths[name] = p
    return paths
