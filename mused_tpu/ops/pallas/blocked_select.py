"""Pallas TPU kernel: fused similarity + stride-binned candidate selection
for the rematerialized huge-window sweep (blocked_affinity.fused_rowblock).

The XLA strip path materializes a (block, n) f32 similarity strip in HBM
(805 MB at block=2048, n=98k), then approx_max_k re-reads it — ~2.4 GB of
HBM traffic per modality per block (column panel + strip write + strip
read).  This kernel never materializes the strip: the (block, tn) sim tile
lives only in VMEM and max-accumulates into a (block, nbins) candidate
buffer; only candidates (~30 MB) ever reach HBM.  Traffic drops to ~1×
column-panel reads — the sweep's HBM floor.

Binning is BY RESIDUE (slot = col % nbins), not by contiguous ranges:
event streams are near-sorted, so a row's true top-k columns cluster in
index space — contiguous bins (lax.approx_max_k's PartialReduce) collide
exactly there, while residue classes spread any <= nbins consecutive
columns into distinct bins (perfect recall on contiguous neighbor runs).
Each column tile of tn contiguous columns covers tn consecutive slots, so
the in-kernel update is an aligned elementwise max on a (block, tn) slab —
no in-tile reduction, no argmax network.

Candidate -> adjacency: the caller runs exact lax.top_k over the (block,
nbins) candidate values (tiny) and scatters the winning column ids.  The
kernel stores the GROUP id g (col = g * nbins + slot) as int8 — n/nbins
<= 127 groups — so the candidate buffer is f32 values + int8 groups.

Semantics mirror affinity.knn_adjacency_block (reference
matrix_operations.py:74-110 kNN-per-modality contract): invalid columns
and the self column rank at NEG; ties keep the lowest column index (the
lowest group wins via strict >, and lax.top_k outside prefers the lowest
slot).  ``binned_candidates_reference`` is the bit-identical XLA
emulation — the CPU path and the test oracle.

Metrics:
  dot      — pre-scaled/normalized rows (text_bf16 columns, embeddings)
  jaccard  — multi-hot counts with HOISTED row sums (tags columns):
             inter via one MXU contraction, union from the sums
  chord    — negative squared euclidean on (n, 3) unit-xyz rows, the
             haversine-rank-equivalent location metric; fed K-padded
  l1       — negative L1 on (n, 2) time rows; K-padded
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _isz(x) -> int:
    """Per-element bytes for the VMEM estimates (int8 tags panels, bf16
    text/embeddings, f32 otherwise)."""
    if x.dtype == jnp.bfloat16:
        return 2
    if x.dtype == jnp.int8:
        return 1
    return 4


def _sim_tile(ar, bc, metric: str, s_r, s_c):
    """(block, tn) similarity tile.  ar: (block, K) rows; bc: (tn, K).
    s_r (block, 1) / s_c (1, tn) are the metric's hoisted row statistics:
    token sums for jaccard, squared norms for chord (computed once per
    window outside the kernel — no in-kernel transposes/reductions)."""
    if metric == "dot":
        return jnp.dot(ar, bc.T, preferred_element_type=jnp.float32)
    if metric == "jaccard":
        if ar.dtype == jnp.int8:
            # int8 MXU dot at 2x the bf16 rate (probe: tags 7.25 -> 5.62
            # ms/block); counts <= token cap are int8-exact, so inter is
            # the SAME integer either way — sims bit-identical
            inter = jnp.dot(ar, bc.T,
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32)
        else:
            inter = jnp.dot(ar, bc.T, preferred_element_type=jnp.float32)
        # counts and sums are exact (bf16/int8 ints, f32 sums): union >= 0,
        # and == 0 only where inter == 0 -> clamped quotient 0 (matches the
        # where(union > 0) guard of the strip path)
        return inter / jnp.maximum(s_r + s_c - inter, 1e-9)
    if metric == "chord":
        # K-padded unit-xyz: pads are zero in BOTH operands, so the padded
        # dot terms vanish; |a-b|^2 = |a|^2 + |b|^2 - 2ab with the norms
        # hoisted
        d2 = s_r + s_c - 2.0 * jnp.dot(ar, bc.T,
                                       preferred_element_type=jnp.float32)
        return -jnp.maximum(d2, 0.0)
    if metric == "chord3":
        # unit-xyz location via explicit per-coordinate differences: keeps
        # full relative precision at small central angles where the
        # norms-minus-dot form (and any dot ranking) saturates in f32 —
        # the same numerics as the strip path's broadcast-difference sim
        acc = jnp.zeros((ar.shape[0], bc.shape[0]), jnp.float32)
        for c in range(3):
            d = ar[:, c][:, None] - bc[:, c][None, :]
            acc += d * d
        return -acc
    if metric == "l1":
        # time modality: 2 real features; VPU broadcast per feature
        acc = jnp.zeros((ar.shape[0], bc.shape[0]), jnp.float32)
        for c in range(2):
            acc += jnp.abs(ar[:, c][:, None] - bc[:, c][None, :])
        return -acc
    raise ValueError(f"unknown metric {metric}")


def _kernel(start_ref, cols_ref, rows_ref, colv_ref, sr_ref, sc_ref,
            vals_ref, grp_ref, *, metric: str, tm: int, tn: int,
            nbins: int):
    i = pl.program_id(0)                 # row tile (outer: acc stays VMEM-
    j = pl.program_id(1)                 # resident across the inner j sweep)
    wraps = nbins // tn
    g = j // wraps                       # group id of this tile
    slot0 = (j % wraps) * tn             # tile covers slots [slot0, slot0+tn)

    @pl.when(j == 0)
    def _():
        vals_ref[:] = jnp.full((tm, nbins), NEG, jnp.float32)
        grp_ref[:] = jnp.zeros((tm, nbins), jnp.int8)

    stats = metric in ("jaccard", "chord")
    s_r = sr_ref[:] if stats else None                     # (tm, 1)
    s_c = sc_ref[:] if stats else None                     # (1, tn)
    sim = _sim_tile(rows_ref[:], cols_ref[:], metric, s_r, s_c)

    # mask invalid columns and the self column
    start = start_ref[0, 0]
    col0 = j * tn
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    row_ids = (start + i * tm
               + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0))
    mask = (colv_ref[:] > 0) & (row_ids != col_ids)
    sim = jnp.where(mask, sim, NEG)

    slot = pl.multiple_of(slot0, tn)
    old = vals_ref[:, pl.ds(slot, tn)]
    take = sim > old                     # strict: lowest group wins ties
    vals_ref[:, pl.ds(slot, tn)] = jnp.where(take, sim, old)
    grp_ref[:, pl.ds(slot, tn)] = jnp.where(
        take, jnp.int8(g), grp_ref[:, pl.ds(slot, tn)])


def _stat_operands(metric: str, row_sums, row_stats, start, block: int,
                   n: int):
    """(s_r (block, 1), s_c (1, n)) hoisted metric statistics for the
    jaccard/chord tiles — shared by the single and pair kernels (ADVICE r4
    #4).  Pre-sliced ``row_stats`` when the colsharded caller supplies them
    (its row panel is psum-broadcast and ``start`` is shard-local), a
    dynamic slice of ``row_sums`` otherwise; dummy zero operands for
    stat-free metrics so the kernel signature stays static."""
    if metric in ("jaccard", "chord"):
        assert row_sums is not None, metric
        if row_stats is not None:
            s_r = row_stats.astype(jnp.float32).reshape(block, 1)
        else:
            s_r = jax.lax.dynamic_slice_in_dim(
                row_sums, start, block).astype(jnp.float32).reshape(block, 1)
        return s_r, row_sums.astype(jnp.float32).reshape(1, n)
    return (jnp.zeros((block, 1), jnp.float32),
            jnp.zeros((1, n), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("metric", "nbins", "tn", "tm", "block",
                                    "interpret"))
def binned_candidates_pallas(cols: jax.Array, rows: jax.Array,
                             col_valid: jax.Array, start, *,
                             metric: str, nbins: int, block: int,
                             row_sums: jax.Array | None = None,
                             row_stats: jax.Array | None = None,
                             tn: int = 512, tm: int = 2048,
                             interpret: bool = False):
    """Stride-binned kNN candidates for rows [start, start+block).

    cols: (n, K) full column panel (bf16 or f32; K-padded to 128 for the
    MXU metrics).  rows: (block, K) the row slice (caller slices — start
    may be traced).  Returns (vals (block, nbins) f32, grp (block, nbins)
    int8 group ids; global column = grp * nbins + slot).

    ``row_stats`` optionally supplies the (block,) row-side metric
    statistics explicitly (jaccard token sums / chord squared norms).  The
    default slices them out of ``row_sums`` — correct only when the row
    panel is a slice of the column panel.  Column-sharded callers
    (parallel/colsharded.py) hold only a column SHARD: their row panel is
    psum-broadcast from the owner chip and ``start`` is the shard-local
    offset (possibly negative, used solely for the self-column mask), so
    the row stats must arrive pre-sliced.

    Grid (block/tm, n/tn), j inner: the (tm, nbins) accumulator block and
    the (tm, K) row tile stay VMEM-resident across the whole column sweep
    and flush once per row tile.  The default tm=2048 keeps the WHOLE row
    block resident, so the (n, K) column panel streams through VMEM
    exactly once per block — the sweep's HBM floor (~60 MB of VMEM at
    n~100k/K=4096; v5e has 128 MB physical, the 16 MB scoped default is
    lifted via vmem_limit_bytes below).
    """
    n = cols.shape[0]
    tm = min(tm, block)
    assert n % tn == 0 and nbins % tn == 0 and n % nbins == 0, \
        (n, tn, nbins)
    assert block % tm == 0, (block, tm)
    assert n // nbins <= 127, "int8 group ids"
    start_arr = jnp.asarray(start, jnp.int32).reshape(1, 1)
    colv = col_valid.astype(jnp.float32).reshape(1, n)
    s_r, s_c = _stat_operands(metric, row_sums, row_stats, start, block, n)

    itemsize = _isz(cols)
    est = (tm * cols.shape[1] * itemsize          # resident row tile
           + 2 * tn * cols.shape[1] * itemsize    # double-buffered B tile
           + tm * tn * 4                          # sim tile
           + tm * nbins * 5)                      # f32 vals + i8 grp acc
    est = est + est // 2 + (1 << 24)              # Mosaic's extra buffers
    grid = (block // tm, n // tn)
    vals, grp = pl.pallas_call(
        functools.partial(_kernel, metric=metric, tm=tm, tn=tn,
                          nbins=nbins),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # start
            pl.BlockSpec((tn, cols.shape[1]), lambda i, j: (j, 0)),
            pl.BlockSpec((tm, rows.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),          # col valid
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),          # s_r
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),          # s_c
        ],
        out_specs=[
            pl.BlockSpec((tm, nbins), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, nbins), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((block, nbins), jnp.float32),
            jax.ShapeDtypeStruct((block, nbins), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(120 << 20, max(est, 32 << 20))),
        interpret=interpret,
    )(start_arr, cols, rows, colv, s_r, s_c)
    return vals, grp


def _pair_kernel(start_ref, colsA_ref, colsB_ref, rowsA_ref, rowsB_ref,
                 colvA_ref, colvB_ref, srA_ref, scA_ref, srB_ref, scB_ref,
                 valsA_ref, grpA_ref, valsB_ref,
                 grpB_ref, *, metricA: str, metricB: str, tm: int, tn: int,
                 nbins: int):
    """Two metrics in ONE grid sweep: each separate sweep pays a
    near-constant per-sweep cost (grid setup, DMA machinery, the row/col-id
    mask epilogue), so sharing the sweep lands the pair near max of the
    singles, not their sum.  Measured at the BASELINE #3 shape: location
    chord3 + time l1 9.07 -> 6.51 ms/block (the VPU sims are sub-ms at
    these widths), tags jaccard + text dot 17.1 -> 13.3 ms/block (the two
    MXU dots share one epilogue).  Stat metrics (jaccard/chord) take their
    hoisted row/col statistics via the sr/sc operands — dummy tiny tensors
    for stat-free metrics, exactly like the single kernel.  Per-modality
    outputs are identical to two binned_candidates_pallas calls (same
    formulas, same mask semantics, same accumulator updates) — the
    per-modality XLA emulation stays the bit-parity oracle."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    wraps = nbins // tn
    g = j // wraps
    slot0 = (j % wraps) * tn

    @pl.when(j == 0)
    def _():
        valsA_ref[:] = jnp.full((tm, nbins), NEG, jnp.float32)
        grpA_ref[:] = jnp.zeros((tm, nbins), jnp.int8)
        valsB_ref[:] = jnp.full((tm, nbins), NEG, jnp.float32)
        grpB_ref[:] = jnp.zeros((tm, nbins), jnp.int8)

    statsA = metricA in ("jaccard", "chord")
    statsB = metricB in ("jaccard", "chord")
    simA = _sim_tile(rowsA_ref[:], colsA_ref[:], metricA,
                     srA_ref[:] if statsA else None,
                     scA_ref[:] if statsA else None)
    simB = _sim_tile(rowsB_ref[:], colsB_ref[:], metricB,
                     srB_ref[:] if statsB else None,
                     scB_ref[:] if statsB else None)

    start = start_ref[0, 0]
    col0 = j * tn
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    row_ids = (start + i * tm
               + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0))
    not_self = row_ids != col_ids
    simA = jnp.where((colvA_ref[:] > 0) & not_self, simA, NEG)
    simB = jnp.where((colvB_ref[:] > 0) & not_self, simB, NEG)

    slot = pl.multiple_of(slot0, tn)
    for vals_ref, grp_ref, sim in ((valsA_ref, grpA_ref, simA),
                                   (valsB_ref, grpB_ref, simB)):
        old = vals_ref[:, pl.ds(slot, tn)]
        take = sim > old                 # strict: lowest group wins ties
        vals_ref[:, pl.ds(slot, tn)] = jnp.where(take, sim, old)
        grp_ref[:, pl.ds(slot, tn)] = jnp.where(
            take, jnp.int8(g), grp_ref[:, pl.ds(slot, tn)])


@functools.partial(jax.jit,
                   static_argnames=("metricA", "metricB", "nbins", "tn",
                                    "tm", "block", "interpret"))
def binned_candidates_pair_pallas(colsA: jax.Array, colsB: jax.Array,
                                  rowsA: jax.Array, rowsB: jax.Array,
                                  colvA: jax.Array, colvB: jax.Array,
                                  start, *, metricA: str, metricB: str,
                                  nbins: int, block: int,
                                  row_sumsA: jax.Array | None = None,
                                  row_statsA: jax.Array | None = None,
                                  row_sumsB: jax.Array | None = None,
                                  row_statsB: jax.Array | None = None,
                                  tn: int = 512,
                                  tm: int = 2048, interpret: bool = False):
    """Stride-binned candidates for TWO metrics over the same row range in
    one kernel launch.  Stat metrics (jaccard/chord) pass their hoisted
    per-column statistics via row_sums{A,B} (and optionally pre-sliced
    row-side stats via row_stats{A,B}, the colsharded contract of the
    single kernel).  Returns (valsA, grpA, valsB, grpB) — each pair
    identical to the single-metric binned_candidates_pallas outputs."""
    n = colsA.shape[0]
    tm = min(tm, block)
    assert colsB.shape[0] == n, (colsA.shape, colsB.shape)
    assert n % tn == 0 and nbins % tn == 0 and n % nbins == 0, \
        (n, tn, nbins)
    assert block % tm == 0, (block, tm)
    assert n // nbins <= 127, "int8 group ids"
    start_arr = jnp.asarray(start, jnp.int32).reshape(1, 1)
    cvA = colvA.astype(jnp.float32).reshape(1, n)
    cvB = colvB.astype(jnp.float32).reshape(1, n)

    srA, scA = _stat_operands(metricA, row_sumsA, row_statsA, start, block, n)
    srB, scB = _stat_operands(metricB, row_sumsB, row_statsB, start, block, n)

    est = (tm * (colsA.shape[1] * _isz(colsA) + colsB.shape[1] * _isz(colsB))
           + 2 * tn * (colsA.shape[1] * _isz(colsA)
                       + colsB.shape[1] * _isz(colsB))
           + 2 * tm * tn * 4
           + 2 * tm * nbins * 5)
    est = est + est // 2 + (1 << 24)
    outs = pl.pallas_call(
        functools.partial(_pair_kernel, metricA=metricA, metricB=metricB,
                          tm=tm, tn=tn, nbins=nbins),
        grid=(block // tm, n // tn),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # start
            pl.BlockSpec((tn, colsA.shape[1]), lambda i, j: (j, 0)),
            pl.BlockSpec((tn, colsB.shape[1]), lambda i, j: (j, 0)),
            pl.BlockSpec((tm, rowsA.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, rowsB.shape[1]), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),          # colv A
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),          # colv B
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),          # s_r A
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),          # s_c A
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),          # s_r B
            pl.BlockSpec((1, tn), lambda i, j: (0, j)),          # s_c B
        ],
        out_specs=[pl.BlockSpec((tm, nbins), lambda i, j: (i, 0))
                   for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((block, nbins), jnp.float32),
            jax.ShapeDtypeStruct((block, nbins), jnp.int8),
            jax.ShapeDtypeStruct((block, nbins), jnp.float32),
            jax.ShapeDtypeStruct((block, nbins), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(120 << 20, max(est, 32 << 20))),
        interpret=interpret,
    )(start_arr, colsA, colsB, rowsA, rowsB, cvA, cvB, srA, scA, srB, scB)
    return tuple(outs)


def binned_candidates_reference(sim: jax.Array, col_valid: jax.Array,
                                start, nbins: int):
    """XLA emulation of the kernel's exact semantics from a materialized
    (block, n) sim strip: the CPU path and the bit-parity test oracle.
    Returns (vals (block, nbins) f32, grp (block, nbins) int8)."""
    block, n = sim.shape
    g = n // nbins
    col_ids = jnp.arange(n)[None, :]
    row_ids = start + jnp.arange(block)[:, None]
    sim = jnp.where((col_valid[None, :]) & (row_ids != col_ids), sim, NEG)
    # col = grp * nbins + slot  ->  (block, g, nbins); lowest group wins
    # ties (argmax returns the first max), matching the kernel's strict >
    s = sim.reshape(block, g, nbins)
    vals = jnp.max(s, axis=1)
    grp = jnp.argmax(s, axis=1).astype(jnp.int8)
    return vals, grp


def budgeted_keep(vals: jax.Array, row_valid: jax.Array, k: int):
    """Exact-k candidate mask: the k-th candidate value thresholds the
    bins, and ties AT the threshold are admitted in slot order up to the
    remaining budget — at nbins == n this reproduces lax.top_k's
    lowest-index tie preference exactly; at a real reduction the tie order
    is deterministic-arbitrary (the reference's own argsort tie order is
    quicksort-arbitrary, SURVEY §2.4)."""
    kk = min(k, vals.shape[1])
    thr = jax.lax.top_k(vals, kk)[0][:, -1:]
    real = vals > NEG / 2
    above = (vals > thr) & real
    tie = (vals == thr) & real
    budget = kk - jnp.sum(above.astype(jnp.int32), axis=1, keepdims=True)
    order = jnp.cumsum(tie.astype(jnp.int32), axis=1)
    keep = above | (tie & (order <= budget))
    return keep & row_valid[:, None]


def adjacency_from_candidates(keeps, grps, n: int) -> jax.Array:
    """(block, n) bool adjacency from per-modality candidate masks —
    NO scatter: candidate (r, slot) with group g IS column g*nbins + slot,
    so the dense adjacency is one elementwise broadcast over
    (block, groups, nbins), and the modality union fuses into the same
    pass.  (The scatter this replaces measured ~12 ms/block at n~100k —
    more than the similarity matmul itself.)"""
    block, nbins = keeps[0].shape
    groups = n // nbins
    gids = jax.lax.broadcasted_iota(jnp.int8, (block, groups, nbins), 1)
    adj = None
    for keep, grp in zip(keeps, grps):
        m = keep[:, None, :] & (grp[:, None, :] == gids)
        adj = m if adj is None else (adj | m)
    return adj.reshape(block, n)


def pad_features_128(x: jax.Array) -> jax.Array:
    """Pad the feature axis to a lane-aligned multiple of 128 (zeros vanish
    in dot/chord metrics)."""
    pad = (-x.shape[1]) % 128
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)))


def resolve_select(cfg, n: int) -> tuple[str, int]:
    """Resolve PipelineConfig.huge_window_fused_select for an n-column
    blocked sweep: (select, nbins) for the blocked_affinity entry points.
    None = auto (the kernel on TPU, the strip path elsewhere — the XLA
    emulation is bit-equal but saves nothing on CPU); explicit True forces
    the binned path (CPU runs the emulation), False forces the strip."""
    fuse_sel = cfg.huge_window_fused_select
    if fuse_sel is None:
        fuse_sel = jax.default_backend() == "tpu"
    nbins = default_nbins(n, k_max=3 * cfg.k_basis) if fuse_sel else 0
    return ("binned" if nbins else "strip"), nbins


def pick_tn(n: int, nbins: int) -> int:
    """Column-tile width dividing both nbins and n."""
    for tn in (512, 256, 128):
        if nbins % tn == 0 and n % tn == 0:
            return tn
    return nbins          # tiny cases: one tile per bin wrap


def default_nbins(n: int, tn: int = 512, target_reduction: int = 64,
                  k_max: int = 0) -> int:
    """Largest divisor structure: nbins = n / g with g | (n // tn), g <=
    target_reduction, and at least ~8*k_max candidate bins when feasible.
    Reduction 64 (nbins=1536 at n~100k) measured fastest: larger candidate
    buffers push the (tm, nbins) accumulators against VMEM and slow the
    whole sweep (3072 bins: 5.0 s; 2048: 3.0; 1536: 2.86 s/window)."""
    if n % tn != 0:
        return 0                      # caller falls back to the strip path
    groups = n // tn
    g = 1
    for cand in range(min(target_reduction, groups), 0, -1):
        if groups % cand == 0:
            g = cand
            break
    nbins = n // g
    while k_max and nbins < 8 * k_max and g > 1:
        g //= 2
        while groups % g != 0:
            g -= 1
        nbins = n // g
    return nbins
