"""Reference-compatible public API — the "one-line backend switch".

A user of kelaendi/mused can replace

    import data_loader, main, metrics_evaluation

with

    from mused_tpu import api as mused

and keep their call sites: the signatures of ``load_sed2012_dataset``,
``prepare_modalities``, ``load_synthetic_dataset``, ``process_streaming_data``,
``process_batch_data``, ``get_initial_results`` and ``compute_all_metrics``
match reference data_loader.py:9,52,190, main.py:13,132 and
metrics_evaluation.py:3,36.
"""
from __future__ import annotations

from mused_tpu.data.sed2012 import load_sed2012_dataset, prepare_modalities  # noqa: F401
from mused_tpu.data.synthetic import load_synthetic_dataset  # noqa: F401
from mused_tpu.engine.streaming import process_streaming_data  # noqa: F401
from mused_tpu.engine.batch import process_batch_data  # noqa: F401
from mused_tpu.utils.metrics import get_initial_results, compute_all_metrics  # noqa: F401
from mused_tpu.ops.swfd import SeqBasedSWFD  # noqa: F401
from mused_tpu.ops.matching import match_clusters  # noqa: F401
from mused_tpu.ops.dbscan import (  # noqa: F401
    dbscan as perform_dbscan_clustering_fn,
    hdbscan as perform_hdbscan_clustering_fn,
    IncrementalDBSCAN,
)


# thin aliases with the reference's exact names/signatures
def perform_dbscan_clustering(data, eps=0.5, min_samples=5):
    """reference matrix_operations.py:235-238"""
    return perform_dbscan_clustering_fn(data, eps=eps, min_samples=min_samples)


def perform_hdbscan_clustering(data, min_cluster_size=5, min_samples=2):
    """reference matrix_operations.py:240-243"""
    return perform_hdbscan_clustering_fn(data, min_cluster_size=min_cluster_size,
                                         min_samples=min_samples)


def create_adjacency_matrix(data, modality_type, k_basis=50):
    """reference matrix_operations.py:14-132, dispatching to the device kernels.

    Accepts the reference's raw per-modality arrays (floats or object strings)
    and returns a dense (n, n) 0/1 numpy adjacency.
    """
    import numpy as np
    import jax.numpy as jnp
    from mused_tpu.data import features as feat
    from mused_tpu.ops import affinity
    from mused_tpu.utils.config import FeatureConfig

    data = np.asarray(data)
    fc = FeatureConfig()
    if modality_type == "location":
        adj = affinity.location_adjacency(jnp.asarray(data, jnp.float32), k_basis)
    elif modality_type == "time":
        adj = affinity.time_adjacency(jnp.asarray(data, jnp.float32), k_basis)
    elif modality_type == "username":
        # reference validity (ref :59): only the empty STRING is invalid;
        # a non-str cell (pandas NaN) is VALID and — because every np.nan
        # is the same object in the reference's dict grouping — ALL NaN
        # rows share one username and form a clique (verified against the
        # reference, review r5; the old mapping marked them invalid)
        def _uid(cell):
            if isinstance(cell, str):
                return -1 if cell == "" else feat.stable_hash(cell)
            return feat.stable_hash("\x00nan")     # shared NaN identity
        ids = np.array([_uid(row[0]) for row in data], np.int64)
        ids = np.where(ids < 0, ids, ids % np.int64(2**31 - 1))
        adj = affinity.username_adjacency(jnp.asarray(ids, jnp.int32))
    elif modality_type == "tags":
        # reference validity (ref :79): only the empty STRING cell is
        # invalid — an empty tag LIST participates with Jaccard 0 and
        # still receives its k argsort-order edges
        cells = [row[0] for row in data]
        valid = np.array([not (isinstance(c, str) and c == "")
                          for c in cells], bool)
        mh = feat.multihot_tags(cells, fc.tags_hash_dim)
        adj = affinity.tags_adjacency(jnp.asarray(mh), k_basis,
                                      valid=jnp.asarray(valid))
    elif modality_type == "text":
        # reference validity (ref :97): a row where EITHER raw cell is a
        # non-empty string participates — even when its text yields no
        # tokens (single-char words), it keeps an all-zero vector and
        # receives k argsort-order zero-sim edges
        valid = np.array([any(isinstance(c, str) and c != "" for c in row)
                          for row in data], bool)
        joined = [((row[0] if isinstance(row[0], str) else "") + " " +
                   (row[1] if isinstance(row[1], str) else "")).strip()
                  for row in data]
        counts = feat.hash_text_counts(joined, fc.text_hash_dim)
        adj = affinity.text_adjacency(jnp.asarray(counts), k_basis,
                                      valid=jnp.asarray(valid))
    else:
        adj = affinity.euclidean_adjacency(jnp.asarray(data, jnp.float32), k_basis)
    return np.asarray(adj)


def fuse_matrices(matrices):
    """reference matrix_operations.py:134-141"""
    import numpy as np
    fused = np.asarray(matrices[0]).copy()
    for m in matrices[1:]:
        fused = np.logical_or(fused, m).astype(int)
    return fused


def perform_svd_reduction(matrix, reduced_dim, seed):
    """reference matrix_operations.py:143-147"""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mused_tpu.ops import reduction
    out = reduction.svd_reduce(jnp.asarray(np.asarray(matrix), jnp.float32),
                               int(reduced_dim), jax.random.key(int(seed)))
    r = min(int(reduced_dim), np.asarray(matrix).shape[1] - 1)
    return np.asarray(out)[:, :r]


def perform_clustering(matrix, n_clusters, seed):
    """reference matrix_operations.py:149-153"""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mused_tpu.ops import kmeans
    labels, _ = kmeans.kmeans(jnp.asarray(np.asarray(matrix), jnp.float32),
                              jnp.int32(n_clusters), jax.random.key(int(seed)),
                              k_max=max(int(n_clusters), 2))
    return np.asarray(labels)
