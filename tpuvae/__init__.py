"""tpuvae — a TPU-native framework for hybrid-language music clustering with VAEs.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``Shahriar1638/Hybrid-Language-Music-Clustering-VAE`` (reference mounted at
``/root/reference``): batched on-device audio DSP feature extraction
(STFT/mel/MFCC/spectral/chroma), multilingual lyric embeddings, three VAE
families (MLP, conditional conv, hybrid conv+MLP), on-device clustering
(K-Means/Agglomerative/DBSCAN/PCA) and clustering metrics, and an artifact +
reporting contract compatible with the reference's ``processed_data{1,2}`` and
``results/clustering_metrics.csv`` file sets.

Layers (bottom-up), mirroring SURVEY.md §1:
  io/        dataset catalog, WAV decode, artifact store        (ref L0/L2)
  dsp/       batched feature extraction kernels                 (ref L1)
  ops/       Pallas TPU kernels for the hot inner loops
  text/      multilingual sentence encoder (JAX inference)      (ref L1)
  models/    VAE families as flax modules                       (ref L3)
  train/     jit/pjit train steps, schedules, checkpoints       (ref L4)
  cluster/   on-device clustering algorithms                    (ref L5)
  metrics/   clustering quality metrics                         (ref L5)
  viz/       host-side t-SNE + report plots                     (ref L6)
  parallel/  device mesh + sharding rules
  infer.py   serving: new clips -> latents + cluster ids       (extension)
  serve.py   HTTP daemon around infer (stdlib-only JSON API)   (extension)
"""

__version__ = "0.1.0"

from tpuvae.config import (  # noqa: F401
    PreprocessConfig,
    AdvancedPreprocessConfig,
    SimpleVAEConfig,
    ConditionalVAEConfig,
    HybridVAEConfig,
    TrainConfig,
    ClusterConfig,
)
