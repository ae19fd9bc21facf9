"""2D plotting of maps, trees, and paths (reference: utils/plot.py:12-179).

Matplotlib renderings of maze problems with explored edges and solution
paths, plus a grid montage helper. Works headless (Agg backend).
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_edges(states, edges, problem, save_path=None, title=None):
    """Render a maze problem with an edge set and highlighted states
    (reference utils/plot.py:12-92)."""

    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 6))
    occ_map = np.asarray(problem["map"])
    w = occ_map.shape[0]

    # occupancy cells in world coords ([-1, 1]^2)
    for i in range(w):
        for j in range(w):
            if occ_map[i, j]:
                x0 = 2.0 * i / w - 1.0
                y0 = 2.0 * j / w - 1.0
                ax.add_patch(
                    plt.Rectangle((x0, y0), 2.0 / w, 2.0 / w, color="0.3")
                )

    for a, b in (edges.items() if isinstance(edges, dict) else edges):
        a = np.asarray(a)
        b = np.asarray(b)
        ax.plot([a[0], b[0]], [a[1], b[1]], "-", color="tab:blue", lw=1, alpha=0.7)

    if states is not None and len(states):
        pts = np.asarray([np.asarray(s)[:2] for s in states])
        ax.plot(pts[:, 0], pts[:, 1], ".", color="tab:orange", ms=4)

    init = np.asarray(problem["init_state"])
    goal = np.asarray(problem["goal_state"])
    ax.plot(init[0], init[1], "g*", ms=14)
    ax.plot(goal[0], goal[1], "r*", ms=14)
    ax.set_xlim(-1, 1)
    ax.set_ylim(-1, 1)
    ax.set_aspect("equal")
    if title:
        ax.set_title(title)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def merge_pic(figs, n_cols, save_path=None):
    """Grid montage of rendered figures (reference utils/plot.py:150-179)."""

    plt = _plt()
    n = len(figs)
    n_rows = (n + n_cols - 1) // n_cols
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(4 * n_cols, 4 * n_rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax in axes[n:]:
        ax.axis("off")
    for ax, f in zip(axes, figs):
        f.canvas.draw()
        img = np.asarray(f.canvas.buffer_rgba())
        ax.imshow(img)
        ax.axis("off")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        return save_path
    return fig
