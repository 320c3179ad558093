"""Golden tests: on-device clustering + metrics vs scikit-learn."""

import numpy as np
import pytest
import jax.numpy as jnp

from sklearn import metrics as skm
from sklearn.cluster import DBSCAN as SkDBSCAN
from sklearn.cluster import AgglomerativeClustering, KMeans as SkKMeans
from sklearn.decomposition import PCA as SkPCA

from tpuvae.cluster import (
    agglomerative,
    dbscan,
    dbscan_eps_sweep,
    kmeans,
    kmeans_k_sweep,
    pca_fit,
    ward_linkage,
    cut_tree,
)
from tpuvae.metrics import (
    adjusted_rand_score,
    calinski_harabasz_score,
    compact_labels,
    davies_bouldin_score,
    normalized_mutual_info,
    purity_score,
    self_distances,
    silhouette_from_distances,
)


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(7)
    centers = np.array([[0, 0, 0], [6, 0, 0], [0, 6, 0], [3, 3, 6]], float)
    x = np.concatenate(
        [rng.normal(c, 0.7, (40, 3)) for c in centers]
    ).astype(np.float32)
    y = np.repeat(np.arange(4), 40)
    return x, y


@pytest.fixture(scope="module")
def random_x():
    return np.random.default_rng(3).normal(size=(100, 8)).astype(np.float32)


# ---------------------------------------------------------------- metrics ---

def test_silhouette_matches_sklearn(blobs, random_x):
    x, y = blobs
    for data, labels in [(x, y), (random_x, np.random.default_rng(0).integers(0, 3, 100))]:
        lab, k = compact_labels(labels)
        got = float(silhouette_from_distances(
            self_distances(jnp.asarray(data)), jnp.asarray(lab), k))
        want = skm.silhouette_score(data, labels)
        assert abs(got - want) < 1e-4, (got, want)


def test_silhouette_with_noise_label(blobs):
    """DBSCAN's -1 must count as its own cluster, as sklearn does."""
    x, y = blobs
    labels = y.copy()
    labels[:7] = -1
    lab, k = compact_labels(labels)
    got = float(silhouette_from_distances(
        self_distances(jnp.asarray(x)), jnp.asarray(lab), k))
    want = skm.silhouette_score(x, labels)
    assert abs(got - want) < 1e-4


def test_davies_bouldin_matches_sklearn(blobs):
    x, y = blobs
    lab, k = compact_labels(y)
    got = float(davies_bouldin_score(jnp.asarray(x), jnp.asarray(lab), k))
    want = skm.davies_bouldin_score(x, y)
    assert abs(got - want) < 1e-4


def test_calinski_harabasz_matches_sklearn(blobs):
    x, y = blobs
    lab, k = compact_labels(y)
    got = float(calinski_harabasz_score(jnp.asarray(x), jnp.asarray(lab), k))
    want = skm.calinski_harabasz_score(x, y)
    assert abs(got - want) / want < 1e-4


def test_external_metrics_match_sklearn(blobs):
    x, y = blobs
    rng = np.random.default_rng(1)
    pred = rng.integers(0, 5, len(y))
    yt, kt = compact_labels(y)
    yp, kp = compact_labels(pred)
    ari = float(adjusted_rand_score(jnp.asarray(yt), jnp.asarray(yp), kt, kp))
    assert abs(ari - skm.adjusted_rand_score(y, pred)) < 1e-6
    nmi = float(normalized_mutual_info(jnp.asarray(yt), jnp.asarray(yp), kt, kp))
    assert abs(nmi - skm.normalized_mutual_info_score(y, pred)) < 1e-5
    # purity against a direct confusion-matrix computation (= reference C27)
    cm = skm.confusion_matrix(y, pred)
    want_purity = np.amax(cm, axis=0).sum() / cm.sum()
    pur = float(purity_score(jnp.asarray(yt), jnp.asarray(yp), kt, kp))
    assert abs(pur - want_purity) < 1e-6
    # perfect agreement edge cases
    assert float(adjusted_rand_score(jnp.asarray(yt), jnp.asarray(yt), kt, kt)) == 1.0
    assert float(normalized_mutual_info(jnp.asarray(yt), jnp.asarray(yt), kt, kt)) == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------------- clustering ---

def test_kmeans_recovers_blobs_like_sklearn(blobs):
    x, y = blobs
    got = kmeans(x, 4, n_init=10, seed=42)
    sk = SkKMeans(n_clusters=4, n_init=10, random_state=42).fit(x)
    assert skm.adjusted_rand_score(got.labels, sk.labels_) == 1.0
    assert abs(got.inertia - sk.inertia_) / sk.inertia_ < 1e-3


def test_kmeans_inertia_parity_on_random(random_x):
    got = kmeans(random_x, 5, n_init=10, seed=42)
    sk = SkKMeans(n_clusters=5, n_init=10, random_state=42).fit(random_x)
    # different RNG streams -> compare solution quality, not labels
    assert got.inertia <= sk.inertia_ * 1.02, (got.inertia, sk.inertia_)


def test_agglomerative_matches_sklearn(blobs, random_x):
    x, _ = blobs
    for data, k in [(x, 4), (x, 7), (random_x, 5)]:
        got = agglomerative(data, k)
        sk = AgglomerativeClustering(n_clusters=k).fit(data)
        assert skm.adjusted_rand_score(got, sk.labels_) == 1.0, (k,)


def test_agglomerative_sweep_reuses_dendrogram(blobs):
    x, _ = blobs
    merges = ward_linkage(x)
    for k in (2, 3, 4, 6):
        got = cut_tree(merges, x.shape[0], k)
        sk = AgglomerativeClustering(n_clusters=k).fit(x)
        assert skm.adjusted_rand_score(got, sk.labels_) == 1.0


def test_dbscan_matches_sklearn(blobs):
    x, _ = blobs
    for eps in (0.8, 1.0, 1.5, 3.0):
        got = dbscan(x, eps, 5)
        sk = SkDBSCAN(eps=eps, min_samples=5).fit(x)
        # identical core/noise structure and cluster agreement
        assert ((got == -1) == (sk.labels_ == -1)).mean() > 0.99, eps
        mask = (got != -1) & (sk.labels_ != -1)
        if mask.sum() > 10:
            assert skm.adjusted_rand_score(got[mask], sk.labels_[mask]) == 1.0


def test_pca_matches_sklearn(blobs):
    x, _ = blobs
    got = pca_fit(x, 2)
    sk = SkPCA(n_components=2).fit(x)
    np.testing.assert_allclose(
        np.abs(got.components), np.abs(sk.components_), atol=1e-4
    )
    np.testing.assert_allclose(got.transform(x), sk.transform(x), atol=1e-3)
    np.testing.assert_allclose(
        got.explained_variance, sk.explained_variance_, rtol=1e-4
    )


# ------------------------------------------------------------------ sweeps --

def test_kmeans_sweep_picks_true_k(blobs):
    x, _ = blobs
    res = kmeans_k_sweep(x, range(2, 8))
    assert res.best_param == 4
    assert res.best_labels is not None and len(res.best_labels) == len(x)


def test_dbscan_sweep_and_fallback(blobs):
    x, _ = blobs
    res = dbscan_eps_sweep(x, np.arange(0.5, 3.0, 0.5))
    assert res.best_param is not None and res.best_score > 0
    # degenerate sweep -> fallback eps (ref Convolutional_VAE.py:370-372)
    res2 = dbscan_eps_sweep(x, [1e-6], fallback_eps=10.0)
    assert res2.best_param == 10.0


def test_dynamic_k_kmeans_matches_static(blobs):
    from tpuvae.cluster.kmeans import kmeans_dynamic

    x, y = blobs
    import sklearn.metrics as skm

    for k in (2, 3, 4, 6):
        dyn = kmeans_dynamic(x, k, k_max=8, n_init=10, seed=42)
        stat = kmeans(x, k, n_init=10, seed=42)
        assert len(set(dyn.labels.tolist())) == len(set(stat.labels.tolist()))
        # equal-quality solutions (RNG differs: dynamic uses k_max-trial
        # seeding); on separated blobs at true k they agree exactly
        assert dyn.inertia <= stat.inertia * 1.05, (k, dyn.inertia, stat.inertia)
    dyn4 = kmeans_dynamic(x, 4, k_max=8, n_init=10, seed=42)
    assert skm.adjusted_rand_score(dyn4.labels, y) == 1.0


def test_nmi_trivial_partitions_match_sklearn():
    import jax.numpy as jnp
    both = normalized_mutual_info(jnp.zeros(5, jnp.int32), jnp.zeros(5, jnp.int32), 1, 1)
    assert float(both) == skm.normalized_mutual_info_score([0]*5, [0]*5) == 1.0
    one = normalized_mutual_info(jnp.zeros(4, jnp.int32),
                                 jnp.asarray([0, 1, 0, 1]), 1, 2)
    assert float(one) == skm.normalized_mutual_info_score([0]*4, [0,1,0,1]) == 0.0


def test_dbscan_chain_cluster_matches_sklearn():
    """Chain-shaped cluster: the O(graph-diameter) propagation stress case
    that motivated pointer jumping — labels must still match sklearn."""
    rng = np.random.default_rng(0)
    blob = lambda c, n: rng.normal(c, 0.3, (n, 2))  # noqa: E731
    chain = (np.stack([np.linspace(0, 50, 400), np.zeros(400)], 1)
             + rng.normal(0, 0.05, (400, 2)))
    x = np.concatenate([
        blob((10, 10), 120), blob((-10, 10), 120), chain
    ]).astype(np.float32)
    mine = dbscan(x, eps=0.5, min_samples=5)
    sk = SkDBSCAN(eps=0.5, min_samples=5).fit(x).labels_
    np.testing.assert_array_equal(mine == -1, sk == -1)
    assert skm.adjusted_rand_score(sk, mine) == 1.0


def test_scale_10k_dbscan_and_silhouette():
    """10k-point synthetic sweep step completes within memory on one device
    (the O(N²) scale-out story past reference N=1336)."""
    rng = np.random.default_rng(1)
    n, k_true = 10_240, 8
    centers = rng.normal(0, 20, (k_true, 16))
    assign = rng.integers(0, k_true, n)
    x = (centers[assign] + rng.normal(0, 1.0, (n, 16))).astype(np.float32)
    lab = dbscan(x, eps=4.0, min_samples=5)
    assert len(set(lab.tolist()) - {-1}) == k_true
    assert skm.adjusted_rand_score(assign, lab) > 0.97
    cl, k = compact_labels(lab)
    d = self_distances(jnp.asarray(x))
    s = float(silhouette_from_distances(d, jnp.asarray(cl), k))
    assert 0.8 < s <= 1.0


def test_dbscan_chain_clusters_10k():
    """Chain-shaped clusters at 10k points: the worst case for an
    O(graph-diameter) label propagation, trivial for pointer jumping.
    Complements the blob-shaped scale test above; partitions must match
    sklearn exactly (core/noise sets are exact by construction)."""
    import sklearn.cluster as skc

    rng = np.random.default_rng(42)
    n = 10_240
    t = np.linspace(0.0, 60.0, n // 3)
    chain1 = np.stack([t, np.sin(t)], axis=1)
    chain2 = np.stack([t, 8.0 + np.cos(t)], axis=1)
    noise = rng.uniform(-5, 70, size=(n - 2 * len(t), 2))
    x = np.concatenate([chain1, chain2, noise]).astype(np.float32)
    eps, min_samples = 0.35, 5
    got = np.asarray(dbscan(jnp.asarray(x), eps=eps,
                            min_samples=min_samples))
    ref = skc.DBSCAN(eps=eps, min_samples=min_samples).fit(x)
    np.testing.assert_array_equal(got == -1, ref.labels_ == -1)
    m = got != -1
    assert skm.adjusted_rand_score(ref.labels_[m], got[m]) == 1.0
