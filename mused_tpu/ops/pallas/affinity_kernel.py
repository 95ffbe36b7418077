"""Pallas TPU kernel: fused pairwise-similarity -> kNN adjacency.

The XLA path (ops/affinity.py) materializes the full (n, n) similarity matrix
in HBM, then runs top_k, then scatters — three HBM round trips of n^2 data.
This kernel fuses all of it per ROW TILE: the (TM, n) similarity strip lives
only in VMEM, accumulated over column tiles on the MXU, thresholded in-register,
and only the binary adjacency strip is written back.  HBM traffic drops from
~3*n^2*4B to n^2*4B (adjacency out) + streamed feature reads — the win grows
with d (BASELINE.md config #4: d=4096 embeddings).

Top-k without an in-kernel sort: the k-th per-row value is found by a
vectorized float bisection over the similarity range (VPU compares + row
sums); a SECOND integer bisection over column index then keeps exactly the
remaining quota of columns tied at the k-th level, lowest index first —
lax.top_k's own tie rule.  This tie budget applies to EVERY metric (round
5; it was jaccard-only): exact ties are routine on real streams
(duplicate geotags/timestamps/texts, empty tag sets), and the earlier
all-ties-pass threshold rule emitted unboundedly more than k edges on
duplicated features (measured degree 44 at k=5).

Supported metrics (covers every modality on the flagship path):
  dot        — cosine/embedding (pre-normalized rows), TF-IDF cosine (rows
               pre-scaled by idf + L2-normalized outside: one O(nd) pass)
  chord3     — location on 3D unit vectors (negative squared chord —
               monotone with haversine, and unlike the dot it keeps full
               relative precision at city-scale angles where the f32 dot
               saturates at exactly 1.0)
  euclidean  — default modality (negative squared distance)
  l1         — time modality (negative |dt_taken| + |dt_upload|)
  jaccard    — tags multi-hot: intersection = one MXU contraction, row set
               sizes reduced in-kernel, sim = inter / (|r| + |c| - inter)

MXU input dtype: ``input_dtype="bfloat16"`` feeds the contraction bf16
operands with f32 accumulation (preferred_element_type) — ~4x MXU
throughput on v5e vs f32 operands.  Exact for 0/1 multi-hot (jaccard) and
for any input already representable in bf16; for continuous features it
rounds inputs to 8 mantissa bits, which can flip kNN ranking inside
near-tie groups (metric-level parity unaffected; the exactness tests use
f32).

Grid: (n/TM, n/TN), j innermost; the sim strip persists in scratch across the
j sweep (TPU grids execute sequentially) and the output block flushes once per
row tile.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
# float32 bisection depth: bounds are the row's own [min-1, max+1], so 30
# halvings resolve (range/2^30) ~ 4e-9 — below the f32 spacing of any data
# value, i.e. still exact w.r.t. top_k (measured: 40 -> 30 saves ~15% of
# kernel time; the strip bisection, not the matmul, dominates at d<=4096)
_BISECT_ITERS = 30


def _sim_block(xr, xc, metric: str):
    if metric == "dot":
        return jnp.dot(xr, xc.T, preferred_element_type=jnp.float32)
    if metric == "euclidean":
        xr32 = xr.astype(jnp.float32)
        xc32 = xc.astype(jnp.float32)
        rn = jnp.sum(xr32 * xr32, axis=1, keepdims=True)
        cn = jnp.sum(xc32 * xc32, axis=1, keepdims=True)
        return -(rn + cn.T - 2.0 * jnp.dot(xr, xc.T,
                                           preferred_element_type=jnp.float32))
    if metric == "jaccard":
        inter = jnp.dot(xr, xc.T, preferred_element_type=jnp.float32)
        sz_r = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
        sz_c = jnp.sum(xc.astype(jnp.float32), axis=1, keepdims=True)
        union = sz_r + sz_c.T - inter
        return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
    if metric == "l1":
        # feature dim is tiny (2 for the time modality): broadcast on the VPU
        diff = jnp.abs(xr[:, None, :].astype(jnp.float32)
                       - xc[None, :, :].astype(jnp.float32))
        return -jnp.sum(diff, axis=-1)
    if metric == "chord3":
        # location on 3D unit vectors: NEGATIVE squared chord via explicit
        # coordinate differences — the f32 dot saturates at exactly 1.0
        # below ~2 km (measured: 20 points 200 m apart gave 5 distinct dot
        # values, the 5 nearest all 1.0), while differences keep full
        # relative precision at small central angles (review r5; same
        # rationale as blocked_select's chord3)
        d3 = (xr[:, None, :3].astype(jnp.float32)
              - xc[None, :, :3].astype(jnp.float32))
        return -jnp.sum(d3 * d3, axis=-1)
    raise ValueError(f"unknown metric {metric}")


def _kernel(x_row_ref, x_col_ref, valid_ref, out_ref, sim_ref, *,
            metric: str, k: int, tn: int, n_cols: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tm = x_row_ref.shape[0]

    xr = x_row_ref[:]
    xc = x_col_ref[:]
    sim = _sim_block(xr, xc, metric)

    # column masking: invalid columns and self-edges
    col_base = j * tn
    col_ids = col_base + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    colv = valid_ref[0, pl.ds(col_base, tn)]
    mask = (colv[None, :] > 0) & (row_ids != col_ids) & (col_ids < n_cols)
    sim_ref[:, pl.ds(col_base, tn)] = jnp.where(mask, sim, NEG)

    @pl.when(j == nj - 1)
    def _():
        strip = sim_ref[:]                       # (TM, n) in VMEM
        # per-row bisection for the k-th largest value; bounds from the VALID
        # value range so 40 halvings land below f32 resolution of the data
        finite = strip > NEG / 2
        rowmin = jnp.min(jnp.where(finite, strip, jnp.inf), axis=1,
                         keepdims=True)
        lo = jnp.where(jnp.isfinite(rowmin), rowmin - 1.0, 0.0)
        hi = jnp.max(jnp.where(finite, strip, -jnp.inf), axis=1,
                     keepdims=True)
        hi = jnp.where(jnp.isfinite(hi), hi + 1.0, 1.0)

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((strip >= mid).astype(jnp.float32), axis=1,
                          keepdims=True)
            take = cnt >= k                      # mid still keeps >= k edges
            return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

        lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
        rowv = valid_ref[0, pl.ds(i * tm, tm)]
        # Tie budget for EVERY metric (review r5 — was jaccard-only):
        # exact ties are not measure-zero on real streams (duplicate
        # geotags/timestamps/texts tie exactly; a popular location made
        # the threshold rule emit degree 44 at k=5).  The value bisection
        # brackets the k-th tie LEVEL, then a SECOND integer bisection
        # over column index keeps exactly (k - #above) tie columns,
        # lowest index first — lax.top_k's own tie rule, so duplicates
        # match the XLA path instead of blowing up the graph density.
        finite2 = strip > NEG / 2
        above = (strip >= hi) & finite2
        tie = (strip >= lo) & ~above & finite2
        need = k - jnp.sum(above.astype(jnp.float32), axis=1,
                           keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, strip.shape, 1)

        def jbody(_, lohi_j):
            lo_j, hi_j = lohi_j
            mid = (lo_j + hi_j) // 2
            cnt = jnp.sum((tie & (cols <= mid)).astype(jnp.float32),
                          axis=1, keepdims=True)
            take = cnt >= need               # mid keeps enough tie columns
            return (jnp.where(take, lo_j, mid),
                    jnp.where(take, mid, hi_j))

        n_full = strip.shape[1]
        lo_j = jnp.full((tm, 1), -1, jnp.int32)
        hi_j = jnp.full((tm, 1), n_full - 1, jnp.int32)
        lo_j, hi_j = jax.lax.fori_loop(0, (n_full - 1).bit_length() + 1,
                                       jbody, (lo_j, hi_j))
        adj = above | (tie & (cols <= hi_j) & (need > 0))
        out_ref[:] = (adj & (rowv[:, None] > 0)).astype(jnp.float32)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "tm", "tn", "interpret",
                                    "input_dtype"))
def knn_adjacency_pallas(x: jax.Array, valid: jax.Array, k: int, *,
                         metric: str = "dot", tm: int = 256, tn: int = 256,
                         interpret: bool | None = None,
                         input_dtype: str = "float32") -> jax.Array:
    """Directed kNN adjacency (n, n) from (n, d) features, fused in Pallas.

    Semantics match ops/affinity.knn_adjacency with exclude_self=True up to
    threshold ties (all sims equal to the k-th value pass).
    ``input_dtype="bfloat16"`` feeds the MXU bf16 operands (f32 accumulate).
    Tile defaults (tm=tn=256) measured fastest on v5e at n=2048/d=4096.
    """
    n, d = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = max(0, min(k, n - 1))
    if k == 0:
        return jnp.zeros((n, n), jnp.float32)
    tm = min(tm, max(128, 1 << (n - 1).bit_length()))   # don't overtile tiny n
    tn = min(tn, max(128, 1 << (n - 1).bit_length()))

    in_dt = jnp.bfloat16 if input_dtype == "bfloat16" else jnp.float32
    # rows pad to a multiple of BOTH tiles — lcm, not max: max covers both
    # only for power-of-two tiles, and a legal non-pow2 tile (tm=384)
    # otherwise left tail columns unwritten in the scratch strip
    both = math.lcm(tm, tn)
    xp = _pad_to(x.astype(in_dt), both, 0)
    if metric not in ("l1", "chord3"):     # MXU path wants lane-aligned d
        xp = _pad_to(xp, 128, 1)
    np_, dp = xp.shape
    validp = _pad_to(valid.astype(jnp.float32), both, 0).reshape(1, np_)

    grid = (np_ // tm, np_ // tn)
    out = pl.pallas_call(
        functools.partial(_kernel, metric=metric, k=k, tn=tn, n_cols=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, dp), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, dp), lambda i, j: (j, 0)),
            pl.BlockSpec((1, np_), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, np_), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, np_), jnp.float32)],
        interpret=interpret,
    )(xp, xp, validp)
    return out[:n, :n]


def location_to_unit_xyz(latlon: jax.Array) -> jax.Array:
    """(n, 2) degrees -> (n, 3) unit sphere vectors: haversine ranking becomes
    a dot-product ranking (distance monotone in the chordal angle)."""
    rad = jnp.deg2rad(latlon)
    lat, lon = rad[:, 0], rad[:, 1]
    return jnp.stack([jnp.cos(lat) * jnp.cos(lon),
                      jnp.cos(lat) * jnp.sin(lon),
                      jnp.sin(lat)], axis=1)
