"""Consolidated results CSV protocol (C30).

Reproduces the reference's read-modify-write contract bit-for-bit
(``Simple_VAE.py:277-295``, ``Conditional_VAE.py:461-487``,
``Convolutional_VAE.py:440-459``): read ``results/clustering_metrics.csv``
if present, drop all rows whose ``Architecture`` matches, append the new
rows, rewrite; plus a per-architecture copy under
``results/<Architecture dir>/clustering_metrics.csv``.  Per-script column
sets differ; pandas concat unions them with NaN fill, same as the reference.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd


def consolidate_metrics(
    results_dir: str | Path,
    df_new: pd.DataFrame,
    architecture: str,
    per_arch_subdir: str | None = None,
) -> Path:
    results_dir = Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    common = results_dir / "clustering_metrics.csv"
    df_new = df_new.copy()
    df_new["Architecture"] = architecture

    if common.exists():
        try:
            df_common = pd.read_csv(common)
            df_common = df_common[df_common["Architecture"] != architecture]
            df_common = pd.concat([df_common, df_new], ignore_index=True)
        except Exception:
            df_common = df_new
    else:
        df_common = df_new
    df_common.to_csv(common, index=False)

    if per_arch_subdir:
        sub = results_dir / per_arch_subdir
        sub.mkdir(parents=True, exist_ok=True)
        df_new.to_csv(sub / "clustering_metrics.csv", index=False)
    return common
