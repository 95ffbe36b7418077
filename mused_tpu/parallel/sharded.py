"""SPMD sharded window step — the framework's multi-chip "training step".

Row-parallel decomposition of the streaming window pipeline (SURVEY.md §5.7:
the O(n^2) affinity construction is the moral analog of blockwise attention —
each chip owns a row block, column data is gathered/rotated over ICI):

  per chip (row shard of m = n/p window rows):
    all_gather column features (small: coords, times, ids)  ......... ICI
    rectangular (m, n) similarity blocks -> top_k -> adjacency shard  MXU
    global TF-IDF document frequencies ....................... psum   ICI
    OR-fuse modality shards .................................. VPU
    local FD sketch of the fused row shard ................... MXU+eigh
    sketch merge ............................... all_gather/ring  ICI
    KMeans on the replicated reduced matrix (n x ell, tiny)

Feature-hash ("model") axis sharding: hashed tag/text feature columns can be
sharded too — the Jaccard/cosine contractions then psum over "model" — giving
the TP analog.  This module implements the "data"-axis shard_map explicitly;
the "model" axis is exercised through GSPMD sharding constraints in
``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mused_tpu.ops import affinity, fd, kmeans
from mused_tpu.parallel import sketch_merge

NEG = affinity.NEG
shard_map = jax.shard_map


# rectangular kNN helper shared with the single-chip and blocked paths
knn_adjacency_block = affinity.knn_adjacency_block


def _row_shard_fused_adjacency(loc_s, time_s, uid_s, tags_s, text_s,
                               k_basis: int, axis_name: str = "data"):
    """Device-local body: fused (m, n) adjacency shard from feature shards.

    Every collective is explicit: all_gather for column features, psum for
    global TF-IDF document frequencies.
    """
    m = loc_s.shape[0]
    p_idx = jax.lax.axis_index(axis_name)
    row_offset = p_idx * m

    def gather(x):
        g = jax.lax.all_gather(x, axis_name)          # (p, m, ...)
        return g.reshape((-1,) + g.shape[2:])          # (n, ...)

    loc_f, time_f, uid_f = gather(loc_s), gather(time_s), gather(uid_s)
    tags_f, text_f = gather(tags_s), gather(text_s)

    mats = []
    # location: haversine row-block vs all columns (ref matrix_operations.py:23-30)
    lv_r = jnp.all(jnp.isfinite(loc_s), axis=1)
    lv_c = jnp.all(jnp.isfinite(loc_f), axis=1)
    sim = -affinity.haversine_block(jnp.where(lv_r[:, None], loc_s, 0.0),
                                    jnp.where(lv_c[:, None], loc_f, 0.0))
    mats.append(knn_adjacency_block(sim, lv_r, lv_c, k_basis, row_offset))

    # time (ref :32-53)
    tv_r = (jnp.all(jnp.isfinite(time_s), axis=1)
            & (time_s[:, 0] != 0.0) & (time_s[:, 1] != 0.0))
    tv_c = (jnp.all(jnp.isfinite(time_f), axis=1)
            & (time_f[:, 0] != 0.0) & (time_f[:, 1] != 0.0))
    sim = -(jnp.abs(time_s[:, :1] - time_f[:, 0][None, :])
            + jnp.abs(time_s[:, 1:2] - time_f[:, 1][None, :]))
    mats.append(knn_adjacency_block(sim, tv_r, tv_c, 3 * k_basis, row_offset))

    # username equality (ref :55-72)
    uv_r, uv_c = uid_s >= 0, uid_f >= 0
    same = (uid_s[:, None] == uid_f[None, :]) & uv_r[:, None] & uv_c[None, :]
    not_self = (row_offset + jnp.arange(m))[:, None] != jnp.arange(uid_f.shape[0])[None, :]
    mats.append((same & not_self).astype(jnp.float32))

    # tags Jaccard (ref :74-89)
    gv_r = jnp.sum(tags_s, axis=1) > 0
    gv_c = jnp.sum(tags_f, axis=1) > 0
    inter = jnp.dot(tags_s, tags_f.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    sizes_r, sizes_c = jnp.sum(tags_s, axis=1), jnp.sum(tags_f, axis=1)
    union = sizes_r[:, None] + sizes_c[None, :] - inter
    sim = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
    mats.append(knn_adjacency_block(sim, gv_r, gv_c, k_basis, row_offset))

    # text TF-IDF cosine with GLOBAL document frequencies via psum (ref :91-110)
    xv_r = jnp.sum(text_s, axis=1) > 0
    n_docs = jax.lax.psum(jnp.sum(xv_r.astype(jnp.float32)), axis_name)
    df = jax.lax.psum(jnp.sum((text_s > 0) & xv_r[:, None], axis=0)
                      .astype(jnp.float32), axis_name)
    idf = jnp.log((1.0 + jnp.maximum(n_docs, 1.0)) / (1.0 + df)) + 1.0
    x_r = text_s * idf[None, :]
    x_r = x_r / jnp.maximum(jnp.linalg.norm(x_r, axis=1, keepdims=True), 1e-12)
    x_c = text_f * idf[None, :]
    x_c = x_c / jnp.maximum(jnp.linalg.norm(x_c, axis=1, keepdims=True), 1e-12)
    xv_c = jnp.sum(text_f, axis=1) > 0
    sim = jnp.dot(x_r, x_c.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    mats.append(knn_adjacency_block(sim, xv_r, xv_c, k_basis, row_offset))

    return affinity.fuse(mats)      # (m, n) fused shard


@functools.partial(jax.jit,
                   static_argnames=("k_basis", "reduced_dim", "k_max", "mesh"))
def sharded_window_step(location, times, user_ids, tags, text, n_clusters,
                        key, *, k_basis: int, reduced_dim: int, k_max: int,
                        mesh):
    """Full multi-chip window step: sharded affinity -> fused shard -> local
    FD -> ICI sketch merge -> KMeans.  Inputs are (n, ...) arrays; the "data"
    axis of the mesh shards rows.  Returns (labels (n,), reduced (n, dim))."""

    def body(loc_s, time_s, uid_s, tags_s, text_s):
        fused_s = _row_shard_fused_adjacency(loc_s, time_s, uid_s, tags_s,
                                             text_s, k_basis)
        st = fd.update_stream(fd.init(reduced_dim, fused_s.shape[1]), fused_s)
        merged = sketch_merge.allgather_merge(st.sketch, reduced_dim)
        return fused_s, merged[None]

    fused, merged = shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data"),
                  P("data", None), P("data", None)),
        out_specs=(P("data", None), P("data", None, None)),
        check_vma=False,
    )(location, times, user_ids, tags, text)

    sketch = merged[0]                     # (reduced_dim, n) replicated
    reduced = sketch.T                     # rows index datapoints (ref main.py:73-76)
    # row-sharded SPMD Lloyd (psum'd centroid accumulation)
    from mused_tpu.parallel.kmeans_sharded import kmeans_sharded
    labels, _ = kmeans_sharded(reduced, n_clusters, key, k_max=k_max,
                               mesh=mesh)
    return labels, reduced
