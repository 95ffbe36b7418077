"""DBSCAN family vs sklearn oracles (the reference wraps sklearn/hdbscan/incdbscan,
reference matrix_operations.py:235-243, 265-298; main.py:87-91)."""
import numpy as np
import pytest
from sklearn.cluster import DBSCAN as SkDBSCAN, HDBSCAN as SkHDBSCAN
from sklearn.metrics import adjusted_rand_score

from mused_tpu.ops import dbscan as dbs


def blobs(rng, k=3, n_per=40, d=4, spread=0.08, with_noise=8):
    centers = rng.normal(size=(k, d)) * 6
    pts = np.concatenate([c + rng.normal(size=(n_per, d)) * spread for c in centers])
    if with_noise:
        pts = np.concatenate([pts, rng.uniform(-12, 12, size=(with_noise, d))])
    return pts.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dbscan_matches_sklearn_partition(seed):
    rng = np.random.default_rng(seed)
    x = blobs(rng)
    ours = dbs.dbscan(x, eps=1.0, min_samples=3)
    want = SkDBSCAN(eps=1.0, min_samples=3).fit_predict(x)
    # identical noise mask and identical partition (labels may permute)
    np.testing.assert_array_equal(ours == -1, want == -1)
    mask = want != -1
    assert adjusted_rand_score(want[mask], ours[mask]) == 1.0


def test_dbscan_chain_connectivity():
    """A straight chain of points within eps forms ONE cluster (propagation
    must cross many hops)."""
    x = np.stack([np.arange(50, dtype=np.float32) * 0.9,
                  np.zeros(50, np.float32)], axis=1)
    labels = dbs.dbscan(x, eps=1.0, min_samples=2)
    assert (labels == 0).all()


def test_dbscan_all_noise():
    x = np.array([[0.0, 0], [10, 0], [0, 10]], np.float32)
    labels = dbs.dbscan(x, eps=1.0, min_samples=2)
    assert (labels == -1).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_hdbscan_recovers_blobs_like_sklearn(seed):
    rng = np.random.default_rng(seed)
    x = blobs(rng, k=3, n_per=50, with_noise=6)
    ours = dbs.hdbscan(x, min_cluster_size=5, min_samples=3)
    want = SkHDBSCAN(min_cluster_size=5, min_samples=3).fit_predict(x)
    assert adjusted_rand_score(want, ours) > 0.95
    # same number of real clusters on clean blobs
    assert len(set(ours) - {-1}) == len(set(want) - {-1}) == 3


def test_incremental_dbscan_contract(rng):
    x = blobs(rng, k=2, n_per=30, with_noise=4)
    inc = dbs.IncrementalDBSCAN(eps=1.0, min_pts=3)
    labels = inc.insert(x[:40]).get_cluster_labels(x[:40])
    assert len(labels) == 40
    labels2 = inc.insert(x[40:]).get_cluster_labels(x[40:])
    assert len(labels2) == len(x) - 40
    # equivalent to batch DBSCAN over everything inserted
    batch = dbs.dbscan(x, eps=1.0, min_samples=3)
    np.testing.assert_array_equal(labels2, batch[40:])


def test_centroid_incremental_label_consistency(rng):
    base = rng.normal(size=(2, 4)) * 6
    w1 = np.concatenate([base[0] + rng.normal(size=(20, 4)) * 0.05,
                         base[1] + rng.normal(size=(20, 4)) * 0.05]).astype(np.float32)
    w2 = np.concatenate([base[1] + rng.normal(size=(20, 4)) * 0.05,
                         base[0] + rng.normal(size=(20, 4)) * 0.05]).astype(np.float32)
    l1, c1, u1 = dbs.dbscan_centroid_incremental(w1, None, None, eps=1.0, min_samples=3)
    l2, c2, u2 = dbs.dbscan_centroid_incremental(w2, c1, u1, eps=1.0, min_samples=3)
    # window-2 clusters land on the geometrically matching window-1 labels
    assert l2[0] == l1[20]   # base[1] cluster keeps its id
    assert l2[20] == l1[0]   # base[0] cluster keeps its id


def test_hdbscan_duplicate_points():
    """Regression (review finding): zero mutual-reachability edges between
    exact duplicates must survive the MST (scipy drops explicit zeros)."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(2, 4)) * 8
    a = np.repeat(base[0][None], 10, axis=0).astype(np.float32)  # exact dups
    b = base[1] + rng.normal(size=(10, 4)).astype(np.float32) * 0.05
    x = np.concatenate([a, b])
    ours = dbs.hdbscan(x, min_cluster_size=4, min_samples=2)
    want = SkHDBSCAN(min_cluster_size=4, min_samples=2).fit_predict(x)
    assert adjusted_rand_score(want, ours) == 1.0


def test_incremental_dbscan_post_eviction_regime(rng):
    """VERDICT r1 weak #4: once the stream exceeds max_buffer, the oldest
    points are evicted and labels come from re-clustering the bounded tail.
    The approximation contract in that regime: (a) labels for the queried
    batch equal exact DBSCAN over the retained buffer, (b) the buffer never
    exceeds the cap, (c) current-structure recovery still works — new blobs
    cluster correctly even after old data is long gone."""
    inc = dbs.IncrementalDBSCAN(eps=0.8, min_pts=3, max_buffer=64)
    # phase 1: two tight blobs far apart
    a = rng.normal(size=(40, 4)).astype(np.float32) * 0.1
    b = rng.normal(size=(40, 4)).astype(np.float32) * 0.1 + 50.0
    inc.insert(a)
    inc.insert(b)          # 80 points -> evicts the first 16 of blob a
    assert len(inc._buf) == 64
    # (a) queried labels == exact DBSCAN over the retained buffer tail
    lbl_b = inc.get_cluster_labels(b)
    exact = dbs.dbscan(inc._buf, eps=0.8, min_samples=3)
    np.testing.assert_array_equal(lbl_b, np.asarray(exact)[-40:])
    # (c) a NEW blob inserted after total eviction of the old data clusters
    c = rng.normal(size=(64, 4)).astype(np.float32) * 0.1 - 50.0
    inc.insert(c)          # evicts everything else
    assert len(inc._buf) == 64
    lbl_c = np.asarray(inc.get_cluster_labels(c))
    assert (lbl_c >= 0).all()          # one dense blob: no noise
    assert len(np.unique(lbl_c)) == 1  # single cluster


# ---------------------------------------------------------------------------
# exact incremental mode (native union-find core + device geometry)
# ---------------------------------------------------------------------------

def _core_mask(x, eps, min_pts):
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    within = d2 <= eps * eps
    return within, within.sum(1) >= min_pts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_incremental_exact_equals_batch_partition(seed):
    """Exact mode: after any batching of the stream, core points carry the
    IDENTICAL partition as batch DBSCAN over everything inserted, and every
    border point attaches to one of its core neighbors' clusters (the only
    permitted deviation is WHICH adjacent cluster a tied border point joins)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-4, 4, size=(300, 3)).astype(np.float32)
    inc = dbs.IncrementalDBSCAN(eps=1.0, min_pts=4)
    for i in range(0, 300, 60):
        inc.insert(x[i:i + 60])
    ours = np.asarray(inc.get_cluster_labels(x))
    batch = np.asarray(dbs.dbscan(x, eps=1.0, min_samples=4))
    within, core = _core_mask(x, 1.0, 4)
    assert adjusted_rand_score(batch[core], ours[core]) == 1.0
    assert ((ours == -1) == (batch == -1)).all()     # same noise mask
    for i in np.where(~core & (ours != -1))[0]:
        nb = np.where(within[i] & core)[0]
        assert ours[i] in set(ours[nb])


def test_incremental_delayed_core_bridges_clusters():
    """The defining incremental case: a point with too few neighbors in its
    own batch becomes core only when a LATER batch supplies the rest — and
    must then bridge two previously-separate clusters.  (A per-window
    re-clustering over a bounded tail gets this wrong once the first batch
    is evicted; the exact structure cannot.)"""
    p = np.array([[0.0, 0.0]], np.float32)
    left = np.array([[-1.0, 0], [-1.9, 0], [-2.8, 0],
                     [-1.0, .3], [-1.9, .3], [-2.8, .3]], np.float32)
    right = np.array([[1.0, 0], [1.9, 0], [2.8, 0],
                      [1.0, .3], [1.9, .3], [2.8, .3]], np.float32)
    inc = dbs.IncrementalDBSCAN(eps=1.0, min_pts=3)
    inc.insert(np.concatenate([p, left]))   # p has only 2 neighbors: border
    inc.insert(right)                       # now 4: core -> one bridged cluster
    allpts = np.concatenate([p, left, right])
    ours = np.asarray(inc.get_cluster_labels(allpts))
    batch = np.asarray(dbs.dbscan(allpts, eps=1.0, min_samples=3))
    np.testing.assert_array_equal(ours, batch)
    assert set(ours) == {0}


def test_incremental_single_point_batches_chain():
    """One point per insert (n_new=1, the smallest batch): a chain built
    point-by-point still connects into one cluster."""
    inc = dbs.IncrementalDBSCAN(eps=1.0, min_pts=2)
    pts = np.stack([np.arange(20, dtype=np.float32) * 0.9,
                    np.zeros(20, np.float32)], axis=1)
    for row in pts:
        inc.insert(row[None, :])
    labels = np.asarray(inc.get_cluster_labels(pts))
    assert (labels == 0).all()


def test_incremental_dense_neighborhoods_force_topk_growth():
    """A dense blob whose within-eps counts exceed the starting top-k width
    (32) exercises the adaptive-k path; labels still match batch DBSCAN."""
    rng = np.random.default_rng(7)
    x = np.concatenate([rng.normal(size=(120, 2)) * 0.2,        # ~all mutual
                        rng.normal(size=(40, 2)) * 0.2 + 10.0]).astype(np.float32)
    inc = dbs.IncrementalDBSCAN(eps=1.0, min_pts=5)
    inc.insert(x[:80]); inc.insert(x[80:])
    ours = np.asarray(inc.get_cluster_labels(x))
    batch = np.asarray(dbs.dbscan(x, eps=1.0, min_samples=5))
    np.testing.assert_array_equal(ours, batch)


def test_incremental_fallback_matches_native(rng, monkeypatch):
    """Without the native library the exact-by-recluster fallback must agree
    with the native structure on tie-free data."""
    from mused_tpu import native
    x = blobs(rng, k=3, n_per=30, with_noise=5)
    inc_native = dbs.IncrementalDBSCAN(eps=1.0, min_pts=3)
    assert inc_native._native_handle() is not None   # bind before patching
    monkeypatch.setattr(native.IncDBHandle, "create",
                        staticmethod(lambda min_pts: None))
    inc_fb = dbs.IncrementalDBSCAN(eps=1.0, min_pts=3)
    for i in range(0, len(x), 35):
        inc_native.insert(x[i:i + 35])
        inc_fb.insert(x[i:i + 35])
    assert inc_fb._handle is None and inc_native._handle is not None
    a = np.asarray(inc_native.get_cluster_labels(x))
    b = np.asarray(inc_fb.get_cluster_labels(x))
    within, core = _core_mask(x, 1.0, 3)
    assert adjusted_rand_score(a[core], b[core]) == 1.0
    assert ((a == -1) == (b == -1)).all()


def test_incremental_snapshot_roundtrip(rng):
    """snapshot/from_snapshot: the restored structure continues the stream
    with labels equal to the uninterrupted run (exact mode is
    batching-invariant, so a one-shot re-insert reaches the same state)."""
    x = blobs(rng, k=2, n_per=40, with_noise=6)
    inc = dbs.IncrementalDBSCAN(eps=1.0, min_pts=3)
    inc.insert(x[:50])
    resumed = dbs.IncrementalDBSCAN.from_snapshot(inc.snapshot())
    inc.insert(x[50:])
    resumed.insert(x[50:])
    np.testing.assert_array_equal(
        np.asarray(inc.get_cluster_labels(x)),
        np.asarray(resumed.get_cluster_labels(x)))


def test_match_centroids_alignment_with_noise():
    """centroid_labels must align with new_centroids even when the window
    has noise: the reference returned unique(labels) (noise -1 included),
    shifting every inherited id by one at the next window and relabeling a
    real cluster as noise (review r5 finding)."""
    rng = np.random.default_rng(0)
    a = rng.normal(size=(20, 3)) * 0.05          # cluster 0
    b = rng.normal(size=(20, 3)) * 0.05 + 10.0   # cluster 1
    noise = np.array([[100.0, -100.0, 50.0]])    # isolated -> -1
    w1 = np.concatenate([a, b, noise]).astype(np.float32)
    lab1 = dbs.dbscan(w1, eps=1.0, min_samples=3)
    assert set(lab1.tolist()) == {-1, 0, 1}
    out1, cents1, cl1 = dbs.match_centroids(w1, lab1, None, None)
    assert cl1.tolist() == [0, 1]                # aligned, no -1
    # window 2: same two clusters, order flipped in the data, plus noise
    w2 = np.concatenate([b + 0.01, a + 0.01, noise + 1.0]).astype(np.float32)
    lab2 = dbs.dbscan(w2, eps=1.0, min_samples=3)
    out2, cents2, cl2 = dbs.match_centroids(w2, lab2, cents1, cl1)
    # rows around b must keep global id 1, rows around a id 0, noise -1
    assert set(out2[:20].tolist()) == {1}
    assert set(out2[20:40].tolist()) == {0}
    assert out2[40] == -1


def test_hdbscan_blocked_duplicate_heavy_no_nan():
    """>= 2*mcs coincident duplicates produce zero-distance TRUE splits:
    inf birth lambdas must be capped (inf - inf was nan and corrupted the
    eom selection, review r5 finding)."""
    from mused_tpu.ops.blocked_hdbscan import hdbscan_blocked
    rng = np.random.default_rng(1)
    groups = [np.tile(rng.normal(size=(1, 4)) * 5, (12, 1))
              for _ in range(3)]                  # 12 EXACT duplicates each
    x = np.concatenate(groups).astype(np.float32)
    got = hdbscan_blocked(x, min_cluster_size=3, min_samples=2, block=12)
    want = dbs.hdbscan(x, min_cluster_size=3, min_samples=2)
    # three pure clusters, identical partitions on both paths
    assert len(set(got.tolist())) == 3
    assert np.array_equal(got, want)
