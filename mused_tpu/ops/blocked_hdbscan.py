"""Blocked HDBSCAN: mutual-reachability MST via Boruvka, beyond the dense cap.

The dense path (ops/dbscan.hdbscan) materializes the (n, n) mutual
reachability matrix for scipy's MST.  Here the graph stays implicit:

  1. core distances: per row block, the min_samples-th smallest distance
     (one n^2/B sweep of (B, n) distance blocks + top_k);
  2. Boruvka rounds: every component finds its minimum outgoing
     mutual-reachability edge — a blocked sweep computing, per row, the
     min over columns of other components — then components merge via host
     union-find.  O(log n) rounds, each one n^2/B sweep;
  3. the MST edges feed the SAME host condensed-tree / excess-of-mass
     extraction as the dense path (ops/dbscan._extract_labels).

Boruvka gives exactly an MST of the mutual-reachability graph (unique-MST
caveat: ties are broken by column index, like any MST among equal-weight
choices — single-linkage heights are identical either way).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.ops.kmeans import _sq_dists

INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("block", "min_samples", "n_real"))
def _core_distances(x, *, min_samples: int, block: int, n_real: int):
    """(n,) distance to the min_samples-th nearest neighbor (self counts).

    k clamps to the REAL row count (padding rows at 1e15 must never become
    someone's k-th neighbor), matching the dense path's min_samples clip."""
    n = x.shape[0]
    xs = x.reshape(n // block, block, -1)
    k = min(min_samples, n_real)

    def body(_, xb):
        d2 = _sq_dists(xb, x)
        # k-th smallest distance == -(k-th largest of -d2)
        neg_topk, _ = jax.lax.top_k(-d2, k)
        return None, jnp.sqrt(jnp.maximum(-neg_topk[:, k - 1], 0.0))

    _, core = jax.lax.scan(body, None, xs)
    return core.reshape(n)


@functools.partial(jax.jit, static_argnames=("block",))
def _min_outgoing(x, core, comp, *, block: int):
    """Per ROW: (weight, col) of its minimum mutual-reachability edge to any
    point in a DIFFERENT component.  One blocked sweep."""
    n = x.shape[0]
    xs = x.reshape(n // block, block, -1)
    core_b = core.reshape(n // block, block)
    comp_b = comp.reshape(n // block, block)

    def body(_, xsb):
        xb, cb, pb = xsb
        d = jnp.sqrt(jnp.maximum(_sq_dists(xb, x), 0.0))
        mreach = jnp.maximum(jnp.maximum(cb[:, None], core[None, :]), d)
        other = pb[:, None] != comp[None, :]
        w = jnp.where(other, mreach, INF)
        col = jnp.argmin(w, axis=1)
        return None, (jnp.min(w, axis=1), col.astype(jnp.int32))

    _, (w, col) = jax.lax.scan(body, None, (xs, core_b, comp_b))
    return w.reshape(n), col.reshape(n)


def _mst_boruvka(x_np: np.ndarray, min_samples: int, block: int):
    """Edges (w, a, b) of an MST of the implicit mutual-reachability graph."""
    from mused_tpu.ops.blocked_dbscan import _pad_rows
    n = len(x_np)
    block = min(block, n)
    # shared far-but-f32-safe padding (blocked_dbscan._pad_rows — one home
    # for the 1e15 constant and its inf-minus-inf rationale, review r5)
    xp = np.asarray(_pad_rows(jnp.asarray(x_np), block))
    pad = len(xp) - n
    xj = jnp.asarray(xp)
    core = _core_distances(xj, min_samples=min_samples, block=block,
                           n_real=n)
    # padding rows: infinitely far, own forever-separate components beyond n
    parent = np.arange(n + pad)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    edges = []
    while True:
        comp = np.fromiter((find(i) for i in range(n)), np.int32, n)
        n_comp = len(np.unique(comp))
        if n_comp <= 1:
            break
        comp_j = jnp.concatenate(
            [jnp.asarray(comp), jnp.arange(n, n + pad, dtype=jnp.int32)])
        w, col = _min_outgoing(xj, core, comp_j, block=block)
        w = np.asarray(w)[:n]
        col = np.asarray(col)[:n]
        # per component: the minimum outgoing edge among its members' rows
        best: dict[int, tuple] = {}
        for i in range(n):
            c = comp[i]
            if np.isfinite(w[i]) and (c not in best or w[i] < best[c][0]):
                best[c] = (w[i], i, int(col[i]))
        merged = False
        for wgt, a, b in sorted(best.values()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
                edges.append((float(wgt), a, b))
                merged = True
        if not merged:      # disconnected graph cannot happen (mreach finite)
            break
    return edges


def hdbscan_blocked(data, min_cluster_size: int = 5, min_samples: int = 2,
                    block: int = 2048) -> np.ndarray:
    """HDBSCAN labels at any n — Boruvka MST over the implicit graph, then
    the dense path's condensed-tree / eom extraction."""
    from mused_tpu.ops import dbscan as dense

    x = np.asarray(data, np.float32)
    n = len(x)
    if n == 0:
        return np.empty(0, np.int64)
    if n == 1:
        return np.array([-1], np.int64)
    edges = sorted(_mst_boruvka(x, min_samples, block))
    return dense._extract_labels(edges, n, min_cluster_size)
