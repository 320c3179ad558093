from tpuvae.viz.tsne import tsne  # noqa: F401
from tpuvae.viz.plots import (  # noqa: F401
    tsne_cluster_language,
    reconstruction_pair,
    tsne_by_genre,
    cluster_language_bar,
    loss_curve,
    tsne_triptych,
)
