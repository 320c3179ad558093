"""A/B: what does the hashed-ngram text channel actually contribute?

The reference embeds lyrics with a pretrained multilingual
sentence-transformer (``1_preprocessing_advanced.py:327-341``) and weights
the text reconstruction loss 200x in the CVAE / 350x in the Hybrid VAE
(``Conditional_VAE.py:233-246``, ``Convolutional_VAE.py:187-194``) — weights
designed for SEMANTIC embeddings.  This container has no pretrained
checkpoint, so production falls back to hashed char-n-grams
(``tpuvae/text/encoder.py``).  VERDICT r4 #5: measure whether that fallback
channel helps, hurts, or is inert for the latent clustering.

Method: duplicate a processed_data2 dir with ``lyrics_embeddings.npy``
zeroed (hard links for everything else), train CVAE + Hybrid on both, and
diff every clustering metric.  A zeroed channel carries no information, so
Δ(metrics) isolates the hashed embedding's contribution under the
reference's loss weights.

Usage (on the corpus you care about — defaults to the reference-scale
cached e2e corpus's preprocess output)::

    python benchmarks/text_ab.py --data2=/tmp/tpuvae_e2e_out \
        [--epochs=30] [--results=/tmp/tpuvae_text_ab]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_zeroed_copy(data2: Path, dest: Path) -> Path:
    """processed_data2 clone with lyrics_embeddings.npy := 0 (same shape)."""
    if dest.exists():
        shutil.rmtree(dest)
    dest.mkdir(parents=True)
    for f in data2.iterdir():
        if f.name == "lyrics_embeddings.npy":
            emb = np.load(f)
            np.save(dest / f.name, np.zeros_like(emb))
        elif f.is_file():
            os.link(f, dest / f.name)   # big mel tensors: no copy
    return dest


def run_arm(tag: str, data2: str, results: Path, epochs: int):
    from tpuvae.config import (
        ClusterConfig,
        ConditionalVAEConfig,
        HybridVAEConfig,
    )
    from tpuvae.pipelines import run_conditional_vae, run_hybrid_vae
    from tpuvae.utils import RunLogger

    import pandas as pd

    out = results / tag
    if out.exists():
        shutil.rmtree(out)
    logger = RunLogger(echo=False)
    ccfg = ClusterConfig()
    t0 = time.time()
    run_conditional_vae(data2, str(out), ConditionalVAEConfig(epochs=epochs),
                        ccfg, logger=logger, make_plots=False)
    run_hybrid_vae(data2, str(out), HybridVAEConfig(epochs=epochs),
                   ccfg, logger=logger, make_plots=False)
    log(f"arm {tag}: trained+swept in {time.time() - t0:.0f}s")
    return pd.read_csv(out / "clustering_metrics.csv")


def main():
    args = dict(a.lstrip("-").split("=", 1) for a in sys.argv[1:])
    data2 = Path(args.get("data2", "/tmp/tpuvae_e2e_out"))
    results = Path(args.get("results", "/tmp/tpuvae_text_ab"))
    epochs = int(args.get("epochs", 30))
    if not (data2 / "lyrics_embeddings.npy").exists():
        raise SystemExit(f"{data2} is not a processed_data2 dir "
                         f"(run preprocess-advanced first)")

    import jax

    log(f"backend: {jax.default_backend()}  data2={data2}  epochs={epochs}")
    backend = "unknown"
    if (data2 / "config.pkl").exists():
        import pickle

        with open(data2 / "config.pkl", "rb") as fh:
            cfg = pickle.load(fh)
        if isinstance(cfg, dict):
            backend = cfg.get("lyrics_embedder_backend", "unknown")
    log(f"text backend under test: {backend}")

    zeroed = make_zeroed_copy(data2, results / "data2_zeroed_text")
    df_text = run_arm("with_text", str(data2), results, epochs)
    df_zero = run_arm("zeroed_text", str(zeroed), results, epochs)

    keys = [c for c in ("Architecture", "Method", "Algorithm")
            if c in df_text.columns]
    metrics = [c for c in ("Silhouette", "NMI", "ARI", "Purity")
               if c in df_text.columns]
    import pandas as pd

    rows = []
    for _, r in df_text.iterrows():
        sel = np.ones(len(df_zero), bool)
        for k in keys:
            # NaN-safe key compare (Arrow-backed astype(str) keeps NaN)
            want = "" if pd.isna(r[k]) else str(r[k])
            sel &= (df_zero[k].fillna("").astype(str) == want).to_numpy()
        zr = df_zero[sel]
        if len(zr) != 1:
            continue
        zr = zr.iloc[0]
        row = {k: (None if pd.isna(r[k]) else r[k]) for k in keys}
        for m in metrics:
            if isinstance(r[m], float) and np.isfinite(r[m]):
                row[m] = round(float(r[m]), 4)
                row[f"d{m}"] = round(float(r[m]) - float(zr[m]), 4)
        rows.append(row)
    out = {"text_backend": backend, "epochs": epochs,
           "rows": rows}
    for row in rows:
        log("  " + json.dumps(row))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
