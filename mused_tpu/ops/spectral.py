"""Spectral clustering on the fused affinity graph.

Not in the reference's approach list but part of this framework's target
workloads (BASELINE.md config #2: crisis stream + spectral clustering) — and
a natural fit on TPU: the whole algorithm is (normalize adjacency -> eigh ->
KMeans), i.e. exactly the dense-matrix ops the MXU/eigh path already runs.

Normalized-cuts formulation (Ng-Jordan-Weiss): rows of the top-k eigenvector
matrix of the symmetric-normalized affinity D^-1/2 (A + A^T)/2 D^-1/2,
row-normalized, clustered with KMeans.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import kmeans as kmeans_mod


@functools.partial(jax.jit, static_argnames=("max_components",))
def spectral_embedding(affinity: jax.Array, n_components: jax.Array,
                       *, max_components: int) -> jax.Array:
    """Spectral embedding with a DYNAMIC component count.

    Returns (n, max_components): the top eigenvectors of the normalized
    affinity in descending order, with columns >= n_components zeroed before
    the NJW row-normalization — so the geometry equals a k=n_components
    embedding while the shape stays static for jit.
    """
    a = (affinity + affinity.T) * 0.5
    a = a * (1.0 - jnp.eye(a.shape[0], dtype=a.dtype))   # no self loops
    deg = jnp.sum(a, axis=1)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    norm = a * inv_sqrt[:, None] * inv_sqrt[None, :]
    # top eigenvectors of the normalized affinity == bottom of the Laplacian
    _, vecs = jnp.linalg.eigh(norm)
    k_cap = min(max_components, vecs.shape[1])
    emb = vecs[:, ::-1][:, :k_cap]                       # descending
    alive = jnp.arange(k_cap)[None, :] < n_components
    emb = jnp.where(alive, emb, 0.0)
    # row-normalize (NJW step); zero rows stay zero
    nrm = jnp.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / jnp.maximum(nrm, 1e-12)
    if k_cap < max_components:
        emb = jnp.concatenate(
            [emb, jnp.zeros((emb.shape[0], max_components - k_cap), emb.dtype)],
            axis=1)
    return emb


@functools.partial(jax.jit, static_argnames=("k_max",))
def spectral_clustering(affinity: jax.Array, n_clusters: jax.Array,
                        key: jax.Array, *, k_max: int):
    """Labels (n,) from normalized-cuts spectral clustering of the affinity;
    n_clusters is dynamic (<= static k_max)."""
    emb = spectral_embedding(affinity, n_clusters, max_components=k_max)
    labels, _ = kmeans_mod.kmeans(emb, n_clusters, key, k_max=k_max)
    return labels
