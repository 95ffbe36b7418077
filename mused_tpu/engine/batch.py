"""Batch engine: whole-subset pipeline (reference main.py:132-167).

adjacency over the full subset -> OR-fuse -> SVD reduce -> one clustering
pass (KMeans | DBSCAN | HDBSCAN).  The reference materializes a dense
subset^2 matrix (O(150k^2) at default scale, SURVEY.md §3.3 flags it); here
the adjacency+fusion device graph is the same jitted code as the streaming
engine, and a guard documents the dense-memory envelope (blocked/sharded
batch construction is the multi-chip path in parallel/).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.ops import dbscan, kmeans, reduction, spectral
from mused_tpu.utils import metrics as metrics_mod
from mused_tpu.utils.config import PipelineConfig
from mused_tpu.engine.streaming import StreamingEngine

MAX_DENSE_ROWS = 32_768  # single-chip dense n^2 guard (~4GB f32 at the cap)


def process_batch_data(results, data_modalities, modality_types, reduced_dim,
                       k_basis, n_clusters, seed, approach,
                       complete_true_labels, noise_rate, label_mode, sorting,
                       eps, min_samples, min_cluster_size, window_size,
                       cfg: PipelineConfig | None = None):
    """Drop-in equivalent of reference main.py:132-167."""
    total_start = metrics_mod.now_ns()
    subset_size = len(data_modalities[0])
    if subset_size > MAX_DENSE_ROWS:
        raise ValueError(
            f"batch engine: dense n^2 adjacency for n={subset_size} exceeds the "
            f"single-chip cap ({MAX_DENSE_ROWS}); use the streaming engine or "
            "the sharded batch path (mused_tpu.parallel)")

    if cfg is None:
        cfg = PipelineConfig(
            seed=seed, subset_size=subset_size, noise_rate=noise_rate,
            label_mode=label_mode, sorting=sorting, window_size=window_size,
            reduced_dim=reduced_dim, k_basis=k_basis, approach=approach,
            eps=eps, min_samples=min_samples, min_cluster_size=min_cluster_size)

    # reuse the streaming engine's featurize+fuse graph on the whole subset
    helper = StreamingEngine(cfg.replace(window_size=max(subset_size, 2)))
    fused = helper.fused_adjacency(data_modalities, modality_types)
    key = jax.random.key(seed)
    reduced = reduction.svd_reduce(fused, reduced_dim, key)

    if approach == "Spectral_batch":
        labels = spectral.spectral_clustering(fused, jnp.int32(n_clusters), key,
                                              k_max=max(int(n_clusters), 2))
        all_clusters = np.asarray(labels)
    elif approach == "HDBSCAN_batch":
        all_clusters = dbscan.hdbscan(np.asarray(reduced),
                                      min_cluster_size=min_cluster_size,
                                      min_samples=min_samples)
    elif approach == "DBSCAN_batch":
        all_clusters = dbscan.dbscan(np.asarray(reduced), eps=eps,
                                     min_samples=min_samples)
    else:
        labels, _ = kmeans.kmeans(reduced, jnp.int32(n_clusters), key,
                                  k_max=max(int(n_clusters), 2))
        all_clusters = np.asarray(labels)

    total_end = metrics_mod.now_ns()
    all_true = np.asarray(complete_true_labels)
    return metrics_mod.compute_all_metrics(
        results, subset_size, noise_rate, label_mode, sorting, reduced_dim,
        k_basis, window_size, np.asarray(all_clusters), all_true,
        total_end, total_start)
