"""Spectral clustering + embedding modality + crisis-stream config
(BASELINE.md config #2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mused_tpu import api
from mused_tpu.ops import affinity, spectral
from mused_tpu.data.synthetic import crisis_embedding_stream


def test_spectral_recovers_block_graph(rng):
    """Two disconnected cliques -> perfect 2-way spectral cut."""
    n = 40
    a = np.zeros((n, n), np.float32)
    a[:20, :20] = 1.0
    a[20:, 20:] = 1.0
    np.fill_diagonal(a, 0)
    labels = np.asarray(spectral.spectral_clustering(
        jnp.asarray(a), jnp.int32(2), jax.random.key(0), k_max=2))
    assert len(set(labels[:20])) == 1
    assert len(set(labels[20:])) == 1
    assert labels[0] != labels[20]


def test_spectral_matches_sklearn_on_blobs(rng):
    from sklearn.cluster import SpectralClustering
    from sklearn.metrics import adjusted_rand_score
    pts = np.concatenate([rng.normal(size=(30, 2)) * 0.1 + c
                          for c in [(0, 0), (5, 5), (0, 5)]]).astype(np.float32)
    adj = np.asarray(affinity.euclidean_adjacency(jnp.asarray(pts), 8))
    ours = np.asarray(spectral.spectral_clustering(
        jnp.asarray(adj), jnp.int32(3), jax.random.key(1), k_max=3))
    want = SpectralClustering(n_clusters=3, affinity="precomputed",
                              random_state=0).fit_predict(
        np.maximum(adj, adj.T))
    assert adjusted_rand_score(want, ours) > 0.9


def test_embedding_adjacency_cosine_knn(rng):
    emb = rng.normal(size=(30, 16)).astype(np.float32)
    emb[4] = 0.0        # zero vector invalid
    adj = np.asarray(affinity.embedding_adjacency(jnp.asarray(emb), 3))
    assert adj[4].sum() == 0 and adj[:, 4].sum() == 0
    valid_rows = [i for i in range(30) if i != 4]
    for i in valid_rows:
        assert adj[i].sum() == 3


def test_crisis_stream_spectral_config():
    """BASELINE.md config #2: two-modality embedding stream + spectral."""
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=256, n_events=4, noise_rate=0.3, d_text=64, d_image=64, seed=0)
    results, _ = api.get_initial_results()
    results = api.process_streaming_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        window_size=128, reduced_dim=16, k_basis=5, n_clusters_total=5,
        seed=0, approach="sSpectral", complete_true_labels=labels,
        step_window_ratio=1, noise_rate=0.3, label_mode="all",
        sorting=False, eps=1.5, min_samples=2)
    # clean embedding clusters: spectral should find real structure
    assert results["nmi_score"][0] > 0.5


def test_crisis_stream_spectral_batch():
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=192, n_events=3, noise_rate=0.2, d_text=48, d_image=48, seed=1)
    results, _ = api.get_initial_results()
    results = api.process_batch_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        reduced_dim=16, k_basis=5, n_clusters=4, seed=0,
        approach="Spectral_batch", complete_true_labels=labels,
        noise_rate=0.2, label_mode="all", sorting=False, eps=1.5,
        min_samples=2, min_cluster_size=3, window_size=64)
    assert results["nmi_score"][0] > 0.5


@pytest.mark.slow
def test_dense_spectral_eigengap_recovers_planted_count(rng):
    """k_source="eigengap" estimates the count from the normalized-affinity
    spectrum inside the same eigh the embedding needs — consistent with the
    blocked/sharded huge-window paths' rule."""
    import jax
    from mused_tpu.ops import affinity, spectral
    for c in (2, 3, 4):
        centers = rng.normal(size=(c, 16)).astype(np.float32) * 8.0
        x = np.concatenate([centers[i] + rng.normal(
            size=(48, 16)).astype(np.float32) * 0.3 for i in range(c)])
        fused = affinity.embedding_adjacency(jnp.asarray(x), 6)
        labels = spectral.spectral_clustering(
            fused, jnp.int32(1), jax.random.key(2), k_max=8,
            k_source="eigengap")   # the given count (1) must be ignored
        assert len(np.unique(np.asarray(labels))) == c


def test_spectral_eigengap_trivial_eigenvalue_not_k1():
    """lambda_1 = 1 exactly (mu_1 = 0) for ANY connected normalized
    affinity; with an absolute floor the i=1 ratio mu_2/floor measured
    ~120x on realistic noisy windows and locked the estimate to k=1
    (crisis stream: every window answered 1 against 5 planted events).
    The data-scaled clamp makes near-zero mu's — trivial or structural —
    mutually ratio-1, so the planted count wins.  Profile shaped like a
    measured crisis window (5 events, noise 0.3)."""
    lam = np.array([1.0, 0.88, 0.87, 0.866, 0.847, 0.459, 0.419, 0.412,
                    0.40, 0.395] + list(np.linspace(0.39, 0.30, 23)),
                   np.float32)
    k = int(spectral.eigengap_k_from_spectrum(jnp.asarray(lam), k_max=32))
    assert k == 5, k


def test_spectral_eigengap_structureless_stays_k1():
    """A structureless window (no nontrivial near-null direction: mu_2
    already tail-sized) must still answer 1 under the data-scaled clamp."""
    lam = np.array([1.0, 0.467, 0.453, 0.451, 0.45, 0.443, 0.436, 0.433]
                   + list(np.linspace(0.43, 0.30, 25)), np.float32)
    k = int(spectral.eigengap_k_from_spectrum(jnp.asarray(lam), k_max=32))
    assert k == 1, k
