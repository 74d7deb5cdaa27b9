"""Golden tests of the in-repo neighbor analytics (utils/neighbors.py)
against sklearn — the dependency the reference used directly
(vlm_pipeline.py:376-379 DBSCAN, simple_policy_dataset.py:141-143 LOF)."""
import numpy as np
import pytest

from robot3dlotus_tpu.utils.neighbors import (
    dbscan_labels, knn_dists, local_outlier_factor_mask)

sklearn = pytest.importorskip("sklearn")


def _clouds(seed, n, blobs=3):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-1, 1, (blobs, 3))
    pts = np.concatenate([
        c + 0.03 * rng.randn(n // blobs, 3) for c in centers])
    noise = rng.uniform(-1.5, 1.5, (max(3, n // 10), 3))
    return np.concatenate([pts, noise]).astype(np.float64)


@pytest.mark.parametrize("seed,n,eps,min_samples", [
    (0, 300, 0.1, 5), (1, 300, 0.05, 3), (2, 600, 0.2, 10),
    (3, 90, 0.4, 4), (4, 40, 0.02, 2),
])
def test_dbscan_exact_label_parity(seed, n, eps, min_samples):
    from sklearn.cluster import DBSCAN
    x = _clouds(seed, n)
    ours = dbscan_labels(x, eps=eps, min_samples=min_samples)
    ref = DBSCAN(eps=eps, min_samples=min_samples).fit(x).labels_
    np.testing.assert_array_equal(ours, ref)


def test_dbscan_duplicates_and_empty():
    from sklearn.cluster import DBSCAN
    x = np.zeros((7, 3))  # all duplicate points -> one cluster
    ours = dbscan_labels(x, eps=0.1, min_samples=5)
    ref = DBSCAN(eps=0.1, min_samples=5).fit(x).labels_
    np.testing.assert_array_equal(ours, ref)
    assert dbscan_labels(np.empty((0, 3)), 0.1, 5).shape == (0,)


@pytest.mark.parametrize("seed,n,k", [(0, 200, 20), (1, 500, 20),
                                      (2, 100, 35), (3, 64, 10)])
def test_lof_mask_matches_sklearn(seed, n, k):
    from sklearn.neighbors import LocalOutlierFactor
    x = _clouds(seed, n)
    ours = local_outlier_factor_mask(x, n_neighbors=k)
    ref = LocalOutlierFactor(n_neighbors=k).fit_predict(x) == 1
    np.testing.assert_array_equal(ours, ref)


def test_lof_nof_values_match():
    # beyond the mask: the underlying negative_outlier_factor_ agrees
    from sklearn.neighbors import LocalOutlierFactor
    x = _clouds(7, 240)
    clf = LocalOutlierFactor(n_neighbors=20)
    clf.fit(x)
    from robot3dlotus_tpu.utils import neighbors as nb
    d, idx = nb._knn(x, 20)
    k_dist = d[:, -1]
    lrd = 1.0 / (np.maximum(k_dist[idx], d).mean(1) + 1e-10)
    nof = -(lrd[idx].mean(1) / lrd)
    np.testing.assert_allclose(nof, clf.negative_outlier_factor_,
                               rtol=1e-9, atol=1e-12)


def test_lof_duplicate_points_and_small_n():
    from sklearn.neighbors import LocalOutlierFactor
    # duplicates drive k_dist -> 0: the 1e-10 regularizer path
    x = np.concatenate([np.zeros((30, 3)),
                        np.random.RandomState(0).randn(10, 3)])
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # sklearn warns on duplicates
        ref = LocalOutlierFactor(n_neighbors=20).fit_predict(x) == 1
    ours = local_outlier_factor_mask(x, n_neighbors=20)
    np.testing.assert_array_equal(ours, ref)
    # n_neighbors >= N clamps to N-1 like sklearn
    y = np.random.RandomState(1).randn(5, 3)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = LocalOutlierFactor(n_neighbors=20).fit_predict(y) == 1
    np.testing.assert_array_equal(local_outlier_factor_mask(y, 20), ref)
    assert local_outlier_factor_mask(np.zeros((1, 3)), 5).tolist() == [True]


def test_knn_dists_matches_sklearn():
    from sklearn.neighbors import NearestNeighbors
    x = _clouds(5, 150)
    nn = NearestNeighbors(n_neighbors=11).fit(x)
    d, _ = nn.kneighbors(x)
    np.testing.assert_allclose(knn_dists(x, 10), d[:, 1:],
                               rtol=1e-9, atol=1e-12)
    with pytest.raises(ValueError):
        knn_dists(x, len(x))
