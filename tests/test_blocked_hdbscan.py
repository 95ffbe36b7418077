"""Blocked (Boruvka) HDBSCAN == dense HDBSCAN, at any n."""
import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from mused_tpu.ops import dbscan as dense
from mused_tpu.ops.blocked_hdbscan import hdbscan_blocked


def blobs(rng, k=3, n_per=50, d=5, noise=8):
    centers = rng.normal(size=(k, d)) * 8
    pts = np.concatenate([c + rng.normal(size=(n_per, d)) * 0.1 for c in centers])
    pts = np.concatenate([pts, rng.uniform(-15, 15, size=(noise, d))])
    return pts.astype(np.float32)


@pytest.mark.parametrize("seed,block", [(0, 32), (1, 64), (2, 41)])
def test_matches_dense_partition(seed, block):
    """Boruvka MST over the implicit graph yields the same clustering as the
    dense scipy-MST path (MST weights are identical; tie edges may differ but
    single-linkage heights — and hence the condensed tree — agree)."""
    rng = np.random.default_rng(seed)
    x = blobs(rng)
    got = hdbscan_blocked(x, min_cluster_size=5, min_samples=3, block=block)
    want = dense.hdbscan(x, min_cluster_size=5, min_samples=3)
    assert adjusted_rand_score(want, got) == 1.0
    np.testing.assert_array_equal(got == -1, want == -1)


def test_matches_sklearn(rng):
    from sklearn.cluster import HDBSCAN as SkHDBSCAN
    x = blobs(rng, k=4, n_per=60, noise=6)
    got = hdbscan_blocked(x, min_cluster_size=5, min_samples=3, block=128)
    want = SkHDBSCAN(min_cluster_size=5, min_samples=3).fit_predict(x)
    assert adjusted_rand_score(want, got) > 0.95


def test_duplicates(rng):
    base = rng.normal(size=(2, 4)) * 8
    a = np.repeat(base[0][None], 12, axis=0).astype(np.float32)
    b = (base[1] + rng.normal(size=(12, 4)) * 0.05).astype(np.float32)
    x = np.concatenate([a, b])
    got = hdbscan_blocked(x, min_cluster_size=4, min_samples=2, block=8)
    want = dense.hdbscan(x, min_cluster_size=4, min_samples=2)
    assert adjusted_rand_score(want, got) == 1.0
