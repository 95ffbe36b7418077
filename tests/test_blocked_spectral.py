"""Blocked spectral clustering == dense spectral partition, at any n."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from sklearn.metrics import adjusted_rand_score

from mused_tpu.ops import affinity, spectral
from mused_tpu.ops import blocked_affinity as ba
from mused_tpu.ops.blocked_spectral import spectral_clustering_blocked


@pytest.mark.slow
def test_matches_dense_partition(rng):
    n, k = 192, 3
    centers = rng.normal(size=(k, 6)) * 8
    x = np.concatenate([c + rng.normal(size=(n // k, 6)) * 0.1
                        for c in centers]).astype(np.float32)
    dense_adj = affinity.euclidean_adjacency(jnp.asarray(x), 8)
    want = np.asarray(spectral.spectral_clustering(
        dense_adj, jnp.int32(k), jax.random.key(0), k_max=k))
    cols = ba.generic_columns([x], ("default",))
    got = np.asarray(spectral_clustering_blocked(
        cols, k, jax.random.key(0), k_max=k, block=64, k_basis=8))
    assert adjusted_rand_score(want, got) == 1.0


def test_with_padding_rows(rng):
    """n not divisible by the block: padded invalid rows must not distort."""
    n, k = 150, 3
    centers = rng.normal(size=(k, 4)) * 8
    x = np.concatenate([c + rng.normal(size=(n // k, 4)) * 0.1
                        for c in centers]).astype(np.float32)
    pad = (-n) % 64
    xp = np.pad(x, ((0, pad), (0, 0)), constant_values=np.nan)
    cols = ba.generic_columns([xp], ("default",))
    got = np.asarray(spectral_clustering_blocked(
        cols, k, jax.random.key(1), k_max=k, block=64, k_basis=8,
        n_real=n))
    assert got.shape == (n,)
    truth = np.repeat(np.arange(k), n // k)
    assert adjusted_rand_score(truth, got) == 1.0


@pytest.mark.slow
def test_batch_engine_blocked_spectral(monkeypatch):
    from mused_tpu.engine import batch as batch_mod
    from mused_tpu.data.synthetic import crisis_embedding_stream
    from mused_tpu import api
    monkeypatch.setattr(batch_mod, "MAX_DENSE_ROWS", 100)
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=192, n_events=3, noise_rate=0.2, d_text=32, d_image=32, seed=7)
    results, _ = api.get_initial_results()
    results = api.process_batch_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        reduced_dim=8, k_basis=5, n_clusters=4, seed=0,
        approach="Spectral_batch", complete_true_labels=labels, noise_rate=0.2,
        label_mode="all", sorting=False, eps=1.5, min_samples=2,
        min_cluster_size=3, window_size=64)
    assert results["nmi_score"][0] > 0.4
