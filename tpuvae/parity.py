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


# -----------------------------------------------------------------------------
# Quality gate: does the pipeline actually RECOVER planted structure?
# -----------------------------------------------------------------------------

# Two-corpus calibration (round 5, VERDICT r4 #6).  The floors are
# properties of `io/synthetic.py`'s generator — CHANGING THE GENERATOR OR
# ANY FLOOR REQUIRES RE-CALIBRATING ON BOTH CORPORA below (real TPU,
# reference scale 1,344×30 s, `benchmarks/quality_corpus.py`):
#
#   corpus A — seed 11, separation 1.0 (the default generator):
#     direct370 ARI 0.980 / purity 0.993; 290-d ARI 0.523 / purity 0.734;
#     CVAE purity 0.679 (majority 0.25); Hybrid ARI 0.182–0.229;
#     hybrid sil 0.665, simple sil 0.092.
#   corpus B — seed 1337, separation 0.75 (genres blended 25 % toward the
#     cross-genre mean — deliberately harder):
#     direct370 ARI 0.672 / purity 0.844; 290-d ARI 0.392 / purity 0.705;
#     CVAE purity 0.519; Hybrid ARI 0.103; sils 0.631 / 0.096.
#
# The Hybrid ARI BAND on corpus A (0.182 vs 0.229) comes from ≤2.4e-7
# param-init rounding differences (eager vs jitted init on TPU) amplified
# by 3-epoch training + the silhouette-chosen k — trained-metric floors
# must sit well below the measured values, not at their edge; they gate
# "learned nothing / collapsed", not "matched the best run ever".
QUALITY_FLOORS = {
    # K-Means on the BASIC 370-d features involves no VAE training at all,
    # so a miss here means the DSP/normalization chain itself regressed —
    # the exact failure mode reproducibility checks cannot see (a broken
    # filterbank constant degrades every run identically).  The strict
    # absolute bar lives HERE because the 370-d vector (with its 80 MFCC
    # timbre dims) recovers the planted genres at ARI ≥0.97 at both the
    # tiny CPU-test corpus AND the 1,344×30 s reference-scale corpus A.
    "direct370_ari": 0.7,
    "direct370_purity": 0.85,
    # "Direct Spectral" (ref Conditional_VAE.py:454-459) clusters the
    # MFCC-less 290-d flats, whose absolute separability is
    # corpus-dependent: 1.0 purity on the tiny 2 s corpus but 0.73 at
    # 1,344×30 s IN EXACT MODE TOO (fast 0.523 vs exact 0.529 ARI,
    # round-4 A/B) — an intrinsic property of the feature set, not
    # numerics.  Its floors are therefore margin-above-chance, still
    # catching "features carry no genre signal".
    "direct_ari": 0.3,
    "direct_purity_margin": 0.4,   # above the majority-class share
    # trained-model floors are intentionally loose (see band note above)
    "cvae_purity_margin": 0.15,   # above the majority-class share
    "hybrid_ari": 0.1,            # measured band 0.182–0.229 on corpus A
    "silhouette": 0.0,
}

# Floors for the HARD corpus profile (separation ≤ 0.95): same regression
# semantics, margins re-derived from corpus B's measured values above.
QUALITY_FLOORS_HARD = {
    "direct370_ari": 0.5,          # measured 0.672
    "direct370_purity": 0.7,       # measured 0.844
    "direct_ari": 0.2,             # measured 0.392
    "direct_purity_margin": 0.3,   # measured margin 0.455
    "cvae_purity_margin": 0.1,     # measured margin 0.269
    "hybrid_ari": 0.05,            # measured 0.103
    "silhouette": 0.0,
}


def quality_floors(separation: float = 1.0) -> dict:
    """Floor set for a corpus difficulty (``io/synthetic.py`` separation).

    Both sets are calibrated at reference scale on real TPU (see the
    two-corpus table above); re-calibrate BOTH whenever a floor or the
    generator changes.
    """
    # default floors are calibrated at separation 1.0 ONLY; anything
    # measurably blended (≤0.95) gets the hard profile
    return dict(QUALITY_FLOORS if separation > 0.95 else QUALITY_FLOORS_HARD)


def run_quality(
    data1: str = "processed_data1",
    data2: str = "processed_data2",
    results_dir: str = "quality_run",
    cluster_cfg=None,
    overrides: dict | None = None,
    floors: dict | None = None,
    fast: bool = True,
) -> dict:
    """Run the full 3-VAE × clustering sweep ONCE on a corpus with planted
    genre structure (tpuvae.io.synthetic gives each genre a distinct
    spectral signature) and assert the pipeline recovers it.

    Complements :func:`run_parity`: parity proves run-vs-run
    reproducibility, this proves the runs are actually *good* — a numerics
    regression that degrades every run identically passes parity but fails
    here.  Returns ``{'ok', 'problems', 'values'}``.
    """
    import numpy as np

    from tpuvae.config import (
        ClusterConfig,
        ConditionalVAEConfig,
        HybridVAEConfig,
        SimpleVAEConfig,
    )
    from tpuvae.pipelines import run_conditional_vae, run_hybrid_vae, run_simple_vae
    from tpuvae.utils import RunLogger

    fl = dict(QUALITY_FLOORS)
    fl.update(floors or {})
    ov = dict(overrides or {})
    if fast:
        ov.setdefault("epochs", 3)
    logger = RunLogger(echo=False)
    ccfg = cluster_cfg if cluster_cfg is not None else ClusterConfig()
    run_simple_vae(data1, results_dir, SimpleVAEConfig(**ov), ccfg,
                   logger=logger, make_plots=False)
    run_conditional_vae(data2, results_dir, ConditionalVAEConfig(**ov), ccfg,
                        logger=logger, make_plots=False)
    run_hybrid_vae(data2, results_dir, HybridVAEConfig(**ov), ccfg,
                   logger=logger, make_plots=False)

    df = pd.read_csv(Path(results_dir) / "clustering_metrics.csv")
    labels = np.load(Path(data2) / "labels.npy", allow_pickle=True)
    _, counts = np.unique(labels, return_counts=True)
    majority = counts.max() / counts.sum()

    problems: list[str] = []
    values: dict[str, float] = {"majority_class_share": round(float(majority), 4)}

    # direct K-Means on the basic 370-d features: the strict DSP-chain
    # gate (see QUALITY_FLOORS) — computed here, no VAE involved
    from tpuvae.cluster import kmeans
    from tpuvae.metrics import adjusted_rand_score, purity_score
    from tpuvae.metrics.labels import compact_labels

    x370 = np.load(Path(data1) / "features_normalized.npy").astype(np.float32)
    y370 = np.load(Path(data1) / "labels.npy", allow_pickle=True)
    cls370, yt370 = np.unique(y370, return_inverse=True)
    km = kmeans(x370, len(cls370), n_init=10, seed=42)
    lab370, k370 = compact_labels(np.asarray(km.labels))
    ari370 = float(adjusted_rand_score(yt370, lab370, len(cls370), k370))
    pur370 = float(purity_score(yt370, lab370, len(cls370), k370))
    values["direct370_ari"] = ari370
    values["direct370_purity"] = pur370
    if ari370 < fl["direct370_ari"]:
        problems.append(
            f"370-d direct K-Means ARI {ari370:.3f} < floor "
            f"{fl['direct370_ari']} — the DSP/normalization chain regressed")
    if pur370 < fl["direct370_purity"]:
        problems.append(
            f"370-d direct K-Means purity {pur370:.3f} < floor "
            f"{fl['direct370_purity']}")

    def _one(mask, what):
        rows = df[mask]
        if len(rows) == 0:
            problems.append(f"missing row: {what}")
            return None
        return rows.iloc[0]

    r = _one(df.get("Method", pd.Series(dtype=str)) == "Direct Spectral",
             "Direct Spectral")
    if r is not None:
        values["direct_ari"] = float(r["ARI"])
        values["direct_purity"] = float(r["Purity"])
        if r["ARI"] < fl["direct_ari"]:
            problems.append(
                f"Direct Spectral ARI {r['ARI']:.3f} < floor "
                f"{fl['direct_ari']} — 290-d flats carry no genre signal"
            )
        floor = majority + fl["direct_purity_margin"]
        if r["Purity"] < floor:
            problems.append(
                f"Direct Spectral purity {r['Purity']:.3f} < "
                f"majority-share+margin {floor:.3f}"
            )

    r = _one(df.get("Method", pd.Series(dtype=str)) == "CVAE (Multi-Modal)",
             "CVAE (Multi-Modal)")
    if r is not None:
        values["cvae_purity"] = float(r["Purity"])
        floor = majority + fl["cvae_purity_margin"]
        if r["Purity"] < floor:
            problems.append(
                f"CVAE purity {r['Purity']:.3f} < majority-share+margin "
                f"{floor:.3f} — latent carries no class structure"
            )

    algo = df.get("Algorithm", pd.Series(dtype=str)).astype(str)
    r = _one(algo.str.startswith("K-Means-Main"), "Hybrid K-Means-Main")
    if r is not None:
        values["hybrid_ari"] = float(r["ARI"])
        values["hybrid_silhouette"] = float(r["Silhouette"])
        if r["ARI"] < fl["hybrid_ari"]:
            problems.append(
                f"Hybrid K-Means ARI {r['ARI']:.3f} < floor {fl['hybrid_ari']}"
            )
        if r["Silhouette"] <= fl["silhouette"]:
            problems.append(
                f"Hybrid K-Means silhouette {r['Silhouette']:.3f} <= "
                f"{fl['silhouette']} — latent space has no cluster geometry"
            )

    r = _one(df.get("Method", pd.Series(dtype=str)) == "VAE + KMeans",
             "Simple VAE + KMeans")
    if r is not None:
        values["simple_silhouette"] = float(r["Silhouette"])
        if r["Silhouette"] <= fl["silhouette"]:
            problems.append(
                f"Simple VAE silhouette {r['Silhouette']:.3f} <= "
                f"{fl['silhouette']}"
            )

    return {"ok": not problems, "problems": problems, "values": values}
