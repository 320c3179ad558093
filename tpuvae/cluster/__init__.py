from tpuvae.cluster.kmeans import (  # noqa: F401
    KMeansResult,
    centers_from_labels,
    kmeans,
)
from tpuvae.cluster.agglomerative import (  # noqa: F401
    agglomerative,
    ward_linkage,
    cut_tree,
)
from tpuvae.cluster.dbscan import dbscan  # noqa: F401
from tpuvae.cluster.pca import pca_fit, pca_transform, PCAResult  # noqa: F401
from tpuvae.cluster.sweeps import (  # noqa: F401
    SweepResult,
    kmeans_k_sweep,
    agglomerative_k_sweep,
    dbscan_eps_sweep,
)
from tpuvae.cluster.spectral import (  # noqa: F401
    spectral_clustering,
    spectral_embedding,
)
