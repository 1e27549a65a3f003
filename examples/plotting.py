"""Shared matplotlib styling for the example/benchmark figures.

Counterpart of the reference's Plots.jl figures (``mpc_simulation.jl:185-231``,
``scaling.jl:57-110``, ``residuals.jl:26-63``) — static PNGs written to
``examples/output/``.

Two-series charts pair a fixed hue order with a line-style secondary encoding
(solid vs dashed) so identity is never color-alone.
"""

from __future__ import annotations

import os

# fixed categorical order — never cycled
SERIES = {
    "spock": {"color": "#2458c5", "ls": "-", "label": "SPOCK (SuperMann)"},
    "cp": {"color": "#c2571a", "ls": "--", "label": "CP (Chambolle-Pock)"},
}

OUTDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def new_axes(title: str, xlabel: str, ylabel: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=150)
    ax.set_title(title, fontsize=11)
    ax.set_xlabel(xlabel, fontsize=10)
    ax.set_ylabel(ylabel, fontsize=10)
    ax.grid(True, which="major", color="0.88", linewidth=0.6)
    ax.tick_params(labelsize=9)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    return fig, ax


def save(fig, name: str) -> str:
    os.makedirs(OUTDIR, exist_ok=True)
    path = os.path.join(OUTDIR, name)
    fig.tight_layout()
    fig.savefig(path)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return path
