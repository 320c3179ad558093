"""Quickstart: synthetic corpus -> features -> Simple VAE -> clusters.

Runs anywhere (CPU included) in a couple of minutes at the tiny geometry
below; drop the ``duration``/``epochs`` overrides for the full
reference-scale run on TPU.  The CLI equivalent is::

    python -m tpuvae.cli synth-data && python -m tpuvae.cli all

Work in a scratch directory — artifacts land under ./Datasets,
./processed_data1 and ./results.
"""

import numpy as np

from tpuvae.cluster import kmeans_k_sweep, pca_transform
from tpuvae.config import PreprocessConfig, SimpleVAEConfig
from tpuvae.io import generate_dataset
from tpuvae.metrics import compact_labels, silhouette_score
from tpuvae.pipelines import preprocess_basic, run_simple_vae


def main():
    # 1. a small reference-layout corpus (WAV files + metadata CSV)
    meta = generate_dataset("Datasets", clips_per_genre_lang=4,
                            duration=2.0, seed=42)

    # 2. batched on-device feature extraction -> processed_data1/
    pcfg = PreprocessConfig(
        dataset_root="Datasets", metadata_csv=str(meta),
        duration=2.0, extract_batch=8,
    )
    preprocess_basic(pcfg)

    # 3. train the Simple VAE and run its clustering report
    run_simple_vae("processed_data1", "results",
                   cfg=SimpleVAEConfig(epochs=10))

    # 4. or drive the pieces yourself: PCA + a silhouette-selected K
    feats = np.load("processed_data1/features_normalized.npy")
    z = pca_transform(feats, n_components=16)
    sweep = kmeans_k_sweep(z, [2, 3, 4, 5])
    labels, k = compact_labels(sweep.best_labels)
    import jax.numpy as jnp

    recheck = float(silhouette_score(jnp.asarray(z), jnp.asarray(labels), k))
    print(f"PCA(16) + KMeans: best k={sweep.best_param} "
          f"silhouette={sweep.best_score:.3f} (recheck: {recheck:.3f})")


if __name__ == "__main__":
    main()
