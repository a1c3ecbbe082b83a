"""Diagnostic plot exports (S9 analog — reference kmer_spectrum.py:196-216
spectrum-fit PNG and contig.py:78-107 per-contig dnd scatter).

SURVEY marks plots "not product-critical"; what matters at scale is
that the plotted AGGREGATES are computed distributed (tiny driver-side
results), not how pixels get drawn. Each helper returns the aggregate
and writes it as CSV next to the warehouse; when matplotlib is
importable (not in this sandbox) a PNG is rendered too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def _maybe_png(pdf, x: str, y: str, path: str, title: str) -> bool:
    try:  # pragma: no cover - matplotlib absent in this environment
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    fig, ax = plt.subplots(figsize=(8, 4))  # pragma: no cover
    ax.scatter(pdf[x], pdf[y], s=6)  # pragma: no cover
    ax.set_xlabel(x); ax.set_ylabel(y); ax.set_title(title)  # pragma: no cover
    fig.savefig(path, dpi=120); plt.close(fig)  # pragma: no cover
    return True  # pragma: no cover


def export_df_spectrum(shingle_df: DataFrame, out_dir: str):
    """DF histogram (counts-of-counts) → CSV (+PNG when possible) —
    the k-mer spectrum plot analog. The aggregation is distributed;
    the collected histogram is ≤ a few hundred rows."""
    os.makedirs(out_dir, exist_ok=True)
    hist = (
        shingle_df.groupBy("df").agg(F.count(F.lit(1)).alias("n_shingles"))
        .orderBy("df")
        .toPandas()
    )
    hist.to_csv(os.path.join(out_dir, "df_spectrum.csv"), index=False)
    _maybe_png(hist, "df", "n_shingles",
               os.path.join(out_dir, "df_spectrum.png"), "shingle DF spectrum")
    return hist


def export_dnd_profile(poscls: DataFrame, out_dir: str, window: int = 100):
    """Per-conversation windowed dnd means → CSV (+PNG when possible) —
    the plot_dnd_ratio moving-average analog (contig.py:88-100,
    non-overlapping windows). Window means are computed distributed."""
    os.makedirs(out_dir, exist_ok=True)
    prof = (
        poscls.groupBy(
            "conv_id",
            F.floor((F.col("pos") - 1) / window).cast("long").alias("win_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_positions"),
            (F.sum("cls") / F.count(F.lit(1))).alias("mean_dnd"),
        )
        .orderBy("conv_id", "win_id")
        .toPandas()
    )
    prof.to_csv(os.path.join(out_dir, "dnd_profile.csv"), index=False)
    _maybe_png(prof, "win_id", "mean_dnd",
               os.path.join(out_dir, "dnd_profile.png"), "dnd moving average")
    return prof
