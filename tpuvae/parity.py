"""Parity harness (BASELINE.md): run the full 3-VAE × clustering sweep twice
and assert every metric in ``clustering_metrics.csv`` reproduces within a
tolerance (±0.01 — the parity bar from BASELINE.json).

With no distributable reference dataset, parity is measured as exact
reproducibility of this framework's own pipeline under the reference's
seeding discipline (seed 42 everywhere, C33) — the same property that makes
the reference's reruns comparable.
"""

from __future__ import annotations

import math
from pathlib import Path

import pandas as pd


def compare_metrics_csv(a: str | Path, b: str | Path, tol: float = 0.01) -> list[str]:
    """Return a list of human-readable mismatches between two consolidated
    metric CSVs (empty list == parity)."""
    da = pd.read_csv(a)
    db = pd.read_csv(b)
    problems: list[str] = []
    if len(da) != len(db):
        return [f"row count differs: {len(da)} vs {len(db)}"]
    key_cols = [c for c in ("Architecture", "Method", "Algorithm") if c in da.columns]
    da = da.sort_values(key_cols).reset_index(drop=True)
    db = db.sort_values(key_cols).reset_index(drop=True)
    for col in da.columns:
        if col not in db.columns:
            problems.append(f"missing column {col}")
            continue
        for i in range(len(da)):
            va, vb = da.at[i, col], db.at[i, col]
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if abs(va - vb) > tol:
                    problems.append(
                        f"{col}[{i}] ({da.at[i, key_cols[0]] if key_cols else i}): "
                        f"{va:.4f} vs {vb:.4f}"
                    )
            elif str(va) != str(vb):
                problems.append(f"{col}[{i}]: {va!r} vs {vb!r}")
    return problems


def run_parity(
    data1: str = "processed_data1",
    data2: str = "processed_data2",
    work_dir: str = "parity_runs",
    tol: float = 0.01,
    fast: bool = True,
    cluster_cfg=None,
    overrides: dict | None = None,
) -> dict:
    """Run the full sweep twice; return {'ok': bool, 'problems': [...]}.

    ``cluster_cfg`` / ``overrides`` (extra model-config fields, e.g.
    ``{"epochs": 2, "batch_size": 8}``) let the harness run on small test
    corpora; defaults reproduce the reference geometry.
    """
    from tpuvae.config import (
        ClusterConfig,
        ConditionalVAEConfig,
        HybridVAEConfig,
        SimpleVAEConfig,
    )
    from tpuvae.pipelines import run_conditional_vae, run_hybrid_vae, run_simple_vae
    from tpuvae.utils import RunLogger

    work = Path(work_dir)
    ov = dict(overrides or {})
    if fast:
        ov.setdefault("epochs", 3)
    logger = RunLogger(echo=False)
    ccfg = cluster_cfg if cluster_cfg is not None else ClusterConfig()
    for run in ("run_a", "run_b"):
        results = str(work / run)
        s = SimpleVAEConfig(**ov)
        c = ConditionalVAEConfig(**ov)
        h = HybridVAEConfig(**ov)
        run_simple_vae(data1, results, s, ccfg, logger=logger, make_plots=False)
        run_conditional_vae(data2, results, c, ccfg, logger=logger,
                            make_plots=False)
        run_hybrid_vae(data2, results, h, ccfg, logger=logger, make_plots=False)
    problems = compare_metrics_csv(
        work / "run_a" / "clustering_metrics.csv",
        work / "run_b" / "clustering_metrics.csv",
        tol=tol,
    )
    return {"ok": not problems, "problems": problems}
