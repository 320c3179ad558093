"""Exploratory data analysis report (C32).

Capability match of ``notebooks/exploratory.ipynb``: loads the
``processed_data2`` artifact set and produces the notebook's figure set as
PNGs plus a text summary —
  * genre and language distributions (bar charts),
  * sample mel-spectrogram previews per genre,
  * t-SNE of raw audio features vs lyric embeddings side by side,
  * feature correlation heatmap (flat 290-d features),
  * describe()-style summary statistics table (CSV).
Exposed as ``python -m tpuvae.cli eda``.
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from tpuvae.io import load_advanced
from tpuvae.viz.tsne import tsne


def run_eda(data_dir: str = "processed_data2", out_dir: str = "results/EDA",
            tsne_perplexity: float = 30.0, seed: int = 42) -> dict:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    data = load_advanced(data_dir)
    mel = np.asarray(data["mel"])
    flat = np.asarray(data["handcrafted"])
    text = np.asarray(data["text"])
    meta = data["metadata"]

    # 1. class / language distributions
    fig, axes = plt.subplots(1, 2, figsize=(14, 5))
    meta["genre"].value_counts().plot(kind="bar", ax=axes[0], color="steelblue")
    axes[0].set_title("Genre distribution")
    axes[0].set_ylabel("clips")
    meta["language"].value_counts().plot(kind="bar", ax=axes[1], color="indianred")
    axes[1].set_title("Language distribution")
    plt.tight_layout()
    plt.savefig(out / "distributions.png")
    plt.close(fig)

    # 2. sample spectrograms (one per genre, up to 6)
    genres = list(meta["genre"].unique())[:6]
    fig, axes = plt.subplots(1, max(len(genres), 1), figsize=(4 * len(genres), 4))
    axes = np.atleast_1d(axes)
    for ax, g in zip(axes, genres):
        idx = meta.index[meta["genre"] == g][0]
        ax.imshow(mel[idx], aspect="auto", origin="lower", cmap="viridis")
        ax.set_title(str(g))
    plt.tight_layout()
    plt.savefig(out / "sample_spectrograms.png")
    plt.close(fig)

    # 3. t-SNE of raw audio features vs lyric embeddings
    genre_codes = pd.factorize(meta["genre"])[0]
    xy_audio = tsne(flat, perplexity=tsne_perplexity, seed=seed)
    xy_text = tsne(text, perplexity=tsne_perplexity, seed=seed)
    fig, axes = plt.subplots(1, 2, figsize=(15, 6))
    for ax, xy, title in (
        (axes[0], xy_audio, "t-SNE of raw audio features"),
        (axes[1], xy_text, "t-SNE of lyric embeddings"),
    ):
        sc = ax.scatter(xy[:, 0], xy[:, 1], c=genre_codes, cmap="tab10",
                        alpha=0.6, s=15)
        ax.set_title(title)
    plt.colorbar(sc, ax=axes[1], label="genre id")
    plt.tight_layout()
    plt.savefig(out / "tsne_raw_features.png")
    plt.close(fig)

    # 4. feature correlation heatmap
    corr = np.corrcoef(flat.T)
    fig = plt.figure(figsize=(8, 7))
    plt.imshow(corr, cmap="coolwarm", vmin=-1, vmax=1)
    plt.colorbar(label="Pearson r")
    plt.title(f"Feature correlation ({flat.shape[1]}×{flat.shape[1]})")
    plt.tight_layout()
    plt.savefig(out / "feature_correlation.png")
    plt.close(fig)

    # 5. describe() summary
    df = pd.DataFrame(flat)
    df.describe().T.to_csv(out / "feature_summary.csv")

    summary = {
        "n_clips": int(len(meta)),
        "mel_shape": list(mel.shape),
        "flat_shape": list(flat.shape),
        "text_shape": list(text.shape),
        "genres": {str(k): int(v) for k, v in
                   meta["genre"].value_counts().items()},
        "languages": {str(k): int(v) for k, v in
                      meta["language"].value_counts().items()},
    }
    return summary
