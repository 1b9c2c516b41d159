"""Plot sinks (SURVEY §2.10, Latanova_v1.py:496-628) — driver-side matplotlib
over small COLLECTED aggregates (histogram bins, category counts, PCA
coordinates). The distributed part is the aggregation (histogram_df /
cat_profile_df / pca); nothing here touches a DataFrame.

matplotlib is optional in this container — every function degrades to a
no-op returning None when it is absent (import-gated per the build rules).
"""

from __future__ import annotations

from typing import Sequence

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:  # pragma: no cover
    HAVE_MPL = False


def plot_histogram_overlay(
    bins_a: Sequence[tuple[int, int]],
    bins_b: Sequence[tuple[int, int]],
    out_path: str,
    labels: tuple[str, str] = ("original", "synthetic"),
    title: str = "distribution",
) -> str | None:
    """Overlayed bar plot of two (bin, count) histograms (the reference's
    original-vs-synthetic histograms, Latanova_v1.py:500-540)."""
    if not HAVE_MPL:
        return None
    fig, ax = plt.subplots(figsize=(8, 4))
    for bins, label, alpha in ((bins_a, labels[0], 0.6), (bins_b, labels[1], 0.6)):
        xs = [b for b, _ in bins]
        ys = [n for _, n in bins]
        ax.bar(xs, ys, alpha=alpha, label=label, width=0.9)
    ax.set_title(title)
    ax.legend()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path


def plot_category_bars(
    counts: Sequence[tuple[str, int]], out_path: str, title: str = "categories", top: int = 10
) -> str | None:
    """Top-N category bar chart (Latanova_v1.py:559-628)."""
    if not HAVE_MPL:
        return None
    counts = list(counts)[:top]
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.bar([c for c, _ in counts], [n for _, n in counts])
    ax.set_title(title)
    ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path


def plot_pca_scatter(
    coords_a: Sequence[tuple[float, float]],
    coords_b: Sequence[tuple[float, float]],
    out_path: str,
    labels: tuple[str, str] = ("original", "synthetic"),
) -> str | None:
    """2-D PCA overlay scatter (Latanova_v1.py:541-558)."""
    if not HAVE_MPL:
        return None
    fig, ax = plt.subplots(figsize=(6, 6))
    for coords, label, marker in ((coords_a, labels[0], "o"), (coords_b, labels[1], "x")):
        if coords:
            xs, ys = zip(*coords)
            ax.scatter(xs, ys, label=label, alpha=0.5, marker=marker, s=12)
    ax.set_title("PCA projection")
    ax.legend()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path
