"""Blocked DBSCAN == dense DBSCAN, at any n (beyond the dense cap)."""
import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from mused_tpu.ops import dbscan as dense
from mused_tpu.ops.blocked_dbscan import dbscan_blocked


def blobs(rng, k=3, n_per=50, d=6, noise=10):
    centers = rng.normal(size=(k, d)) * 8
    pts = np.concatenate([c + rng.normal(size=(n_per, d)) * 0.1 for c in centers])
    pts = np.concatenate([pts, rng.uniform(-15, 15, size=(noise, d))])
    return pts.astype(np.float32)


@pytest.mark.parametrize("seed,block", [(0, 32), (1, 64), (2, 37)])
def test_matches_dense_exactly(seed, block):
    """Same definition, same compaction: labels identical to the dense kernel
    (including border attachment and noise), for any block size incl. ones
    that force padding."""
    rng = np.random.default_rng(seed)
    x = blobs(rng)
    got = dbscan_blocked(x, eps=1.0, min_samples=3, block=block)
    want = np.asarray(dense.dbscan(x, eps=1.0, min_samples=3))
    np.testing.assert_array_equal(got, want)


def test_chain_needs_pointer_jumping():
    """A 300-point chain: diameter 300, but pointer jumping converges in
    far fewer than max_rounds sweeps."""
    x = np.stack([np.arange(300, dtype=np.float32) * 0.9,
                  np.zeros(300, np.float32)], axis=1)
    labels = dbscan_blocked(x, eps=1.0, min_samples=2, block=64, max_rounds=32)
    assert (labels == 0).all()


def test_sklearn_partition(rng):
    from sklearn.cluster import DBSCAN as SkDBSCAN
    x = blobs(rng, k=4, n_per=60)
    got = dbscan_blocked(x, eps=1.0, min_samples=3, block=128)
    want = SkDBSCAN(eps=1.0, min_samples=3).fit_predict(x)
    np.testing.assert_array_equal(got == -1, want == -1)
    mask = want != -1
    assert adjusted_rand_score(want[mask], got[mask]) == 1.0


def test_batch_engine_blocked_dbscan(monkeypatch):
    """DBSCAN_batch beyond the dense cap routes through the blocked kernel."""
    from mused_tpu.engine import batch as batch_mod
    from mused_tpu.data.synthetic import crisis_embedding_stream
    from mused_tpu import api
    monkeypatch.setattr(batch_mod, "MAX_DENSE_ROWS", 100)
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=192, n_events=3, noise_rate=0.2, d_text=32, d_image=32, seed=6)
    results, _ = api.get_initial_results()
    results = api.process_batch_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        reduced_dim=8, k_basis=4, n_clusters=4, seed=0,
        approach="DBSCAN_batch", complete_true_labels=labels, noise_rate=0.2,
        label_mode="all", sorting=False, eps=0.5, min_samples=3,
        min_cluster_size=3, window_size=64)
    assert len(results["f1_score"]) == 1
