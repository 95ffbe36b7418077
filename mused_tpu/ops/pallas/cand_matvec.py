"""Pallas TPU kernels: fused-adjacency matvec straight from kNN candidates.

The huge-window fold (reference main.py:58-76 SWFD semantics at windows the
reference could never materialize) consumes (block, n) fused adjacency
blocks only through matrix products — ``rows^T @ v`` and ``rows @ y`` inside
fd.shrink_rr_pair.  The measured floor of that path (docs/fd_roofline.md
round-3 probe matrix) is candidate -> DENSE block production: the
stride-binned select kernel emits compact (block, nbins) candidates, but the
fold then expands them to a 200M-element dense block in HBM that its three
G-applications re-read.

These kernels skip the dense block entirely: the candidate slabs (int8,
~3 MB per modality per block — 64x smaller than the dense bf16 block) stay
VMEM-resident, and each column-group's (block, nbins) 0/1 tile is rebuilt
on the fly as the bf16 LHS/RHS of an MXU product.  The fused-OR union across
modalities and the reference's username equality modality (all rows sharing
a user id, reference matrix_operations.py:55-72) are evaluated inside the
mask build, so the product sees exactly the same fused adjacency as
blocked_affinity.fused_rowblock — it just never exists in memory.

Candidate slab encoding (one int8 per (row, slot) per binned modality):
    slab[r, s] = group id g of the kept candidate   (column = g*nbins + s)
               = -1 when slot s holds no kept candidate for row r
Group membership for column tile g is then ONE equality compare per
modality; the union is a bitwise OR of the compares.

Semantics notes:
  - Binned candidates already exclude invalid and self columns (see
    ops/pallas/blocked_select.py); only the username equality needs the
    explicit not-self mask here.
  - Invalid uids are pre-masked by the caller to -1 (rows) / -2 (columns)
    so invalid never matches anything, mirroring ``uid >= 0`` validity.
  - Products are bf16 x bf16 with f32 accumulation.  The 0/1 masks are
    bf16-EXACT, so a product with a bf16 operand x equals the f32 product
    of x rounded to bf16; callers needing ~f32 operand precision pass the
    split [hi | lo] packing (hi = bf16(x), lo = bf16(x - hi)) as extra
    columns and sum the halves — two MXU passes on a shared mask build.

``*_reference`` are the XLA emulations (dense union per column group,
same per-group accumulation order) — the CPU path and the test oracle.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class CandBlock(NamedTuple):
    """Candidate-form fused adjacency rows [start, start+block) of an
    implicit (n, n) fused kNN adjacency (n = groups * nbins).

    ``g0`` is the GLOBAL id of local group 0 (column c of local group g is
    globally (g0 + g) * nbins + s): 0 on the single-chip path; on the
    column-sharded layout (parallel/colsharded) each chip folds only the
    groups it owns, with slabs re-encoded to LOCAL ids and g0 = its global
    group offset — the username col ids and the self-column compare stay
    globally correct while slab compares stay int8."""

    slabs: jax.Array            # (M, block, nbins) int8: LOCAL grp or -1
    uid_rows: jax.Array | None  # (block, 1) int32, -1 where invalid
    uid_cols: jax.Array | None  # (groups, nbins) int32, -2 where invalid
    start: jax.Array            # () int32 — global row offset
    g0: jax.Array | int = 0     # () int32 — global group offset

    @property
    def block(self) -> int:
        return self.slabs.shape[1]

    @property
    def nbins(self) -> int:
        return self.slabs.shape[2]


def pack_slab(keep: jax.Array, grp: jax.Array) -> jax.Array:
    """(block, nbins) int8 slab from budgeted_keep's mask + group ids."""
    return jnp.where(keep, grp, jnp.int8(-1))


def mask_uids(uid: jax.Array, valid: jax.Array, nbins: int,
              rows_start=None, block: int | None = None):
    """(uid_rows, uid_cols) operands for a CandBlock from the window's
    (n,) int32 uids + validity.  ``rows_start``/``block`` slice the row
    side (traced start ok); cols reshape to (groups, nbins) — column
    c = g*nbins + s lands at [g, s]."""
    ucol = jnp.where(valid, uid, -2).reshape(-1, nbins).astype(jnp.int32)
    urow_full = jnp.where(valid, uid, -1).astype(jnp.int32)
    if rows_start is None:
        urow = urow_full
    else:
        urow = jax.lax.dynamic_slice_in_dim(urow_full, rows_start, block)
    return urow.reshape(-1, 1), ucol


def _mask_tile(slabs_ref, uidr_ref, uidc_ref, g, start, g0, tm: int,
               nbins: int, n_mod: int, has_user: bool):
    """(tm, nbins) bool fused-adjacency tile for LOCAL column group ``g``
    (global group g0 + g).  uidc_ref is the (1, nbins) slice of the FLAT
    (1, n_local) column-uid row (local column c = g*nbins + s lives at
    flat index c)."""
    # slabs are int8 in HBM (bandwidth) but compare in i32: the v5e VPU
    # rejects sub-word compares ("Target does not support this comparison")
    mask = slabs_ref[0].astype(jnp.int32) == g
    for m in range(1, n_mod):
        mask = mask | (slabs_ref[m].astype(jnp.int32) == g)
    if has_user:
        same = uidr_ref[:] == uidc_ref[:]          # (tm,1) vs (1,nbins)
        row_ids = (start
                   + jax.lax.broadcasted_iota(jnp.int32, (tm, nbins), 0))
        col_ids = ((g0 + g) * nbins
                   + jax.lax.broadcasted_iota(jnp.int32, (tm, nbins), 1))
        mask = mask | (same & (row_ids != col_ids))
    return mask


def _matvec_t_kernel(start_ref, slabs_ref, uidr_ref, uidc_ref, x_ref,
                     out_ref, edges_ref, *, tm: int, nbins: int, n_mod: int,
                     has_user: bool):
    """out_t[:, g*nbins:(g+1)*nbins] = x @ W_g  (x pre-transposed (r, tm));
    edges accumulates the exact fused edge count (= ||rows||_F^2 for 0/1)."""
    g = pl.program_id(0)
    mask = _mask_tile(slabs_ref, uidr_ref, uidc_ref, g, start_ref[0, 0],
                      start_ref[0, 1], tm, nbins, n_mod, has_user)
    w = mask.astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(g == 0)
    def _():
        edges_ref[:, :] = jnp.zeros((1, 1), jnp.float32)
    edges_ref[:, :] += jnp.sum(mask.astype(jnp.float32)).reshape(1, 1)


def _matvec_kernel(start_ref, slabs_ref, uidr_ref, uidc_ref, y_ref,
                   out_ref, *, tm: int, nbins: int, n_mod: int,
                   has_user: bool):
    """out (tm, r) += W_g @ y[g*nbins:(g+1)*nbins]  accumulated over g."""
    g = pl.program_id(0)
    mask = _mask_tile(slabs_ref, uidr_ref, uidc_ref, g, start_ref[0, 0],
                      start_ref[0, 1], tm, nbins, n_mod, has_user)
    w = mask.astype(jnp.bfloat16)

    @pl.when(g == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += jnp.dot(w, y_ref[:], preferred_element_type=jnp.float32)


def _operands(cand: CandBlock):
    """(has_user, uid_rows) — uid_cols is always present (it carries the
    (groups, nbins) column geometry); uid_rows=None turns the username
    modality off statically (a dummy row operand feeds the kernel)."""
    has_user = cand.uid_rows is not None
    uidr = (cand.uid_rows if has_user
            else jnp.full((cand.block, 1), -1, jnp.int32))
    start = jnp.stack([jnp.asarray(cand.start, jnp.int32).reshape(()),
                       jnp.asarray(cand.g0, jnp.int32).reshape(())]
                      ).reshape(1, 2)
    return has_user, uidr, start


def _vmem_limit(cand: CandBlock, r: int) -> int:
    m_, tm, nbins = cand.slabs.shape
    est = (m_ * tm * nbins                 # resident slabs (i8)
           + tm * nbins * 3                # mask + bf16 tile
           + tm * r * 6                    # x / out
           + nbins * r * 6)
    est = est + est // 2 + (1 << 24)
    return min(120 << 20, max(est, 32 << 20))


@functools.partial(jax.jit, static_argnames=("interpret",))
def matvec_t_pallas(cand: CandBlock, x_t: jax.Array,
                    interpret: bool = False):
    """rows^T @ x for the implicit fused rows: x_t is x PRE-TRANSPOSED
    (r, block) bf16; returns (out_t (r, n) f32, edges () f32).

    r and block must be 128-multiples (pad x with zero rows)."""
    m_, tm, nbins = cand.slabs.shape
    r = x_t.shape[0]
    assert cand.uid_cols is not None, \
        "CandBlock.uid_cols carries the (groups, nbins) column geometry; " \
        "pass a dummy int32 full of -2 when there is no username modality"
    groups = cand.uid_cols.shape[0]
    n = groups * nbins
    has_user, uidr, start = _operands(cand)
    assert x_t.shape == (r, tm) and x_t.dtype == jnp.bfloat16, x_t.shape
    uidc_flat = cand.uid_cols.reshape(1, n)
    out, edges = pl.pallas_call(
        functools.partial(_matvec_t_kernel, tm=tm, nbins=nbins, n_mod=m_,
                          has_user=has_user),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # start
            pl.BlockSpec((m_, tm, nbins), lambda g: (0, 0, 0)),    # slabs
            pl.BlockSpec((tm, 1), lambda g: (0, 0)),               # uid rows
            pl.BlockSpec((1, nbins), lambda g: (0, g)),            # uid cols
            pl.BlockSpec((r, tm), lambda g: (0, 0)),               # x_t
        ],
        out_specs=[
            pl.BlockSpec((r, nbins), lambda g: (0, g)),
            pl.BlockSpec((1, 1), lambda g: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, n), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(cand, r)),
        interpret=interpret,
    )(start, cand.slabs, uidr, uidc_flat, x_t)
    return out, edges[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def matvec_pallas(cand: CandBlock, y: jax.Array, interpret: bool = False):
    """rows @ y for the implicit fused rows: y (n, r) bf16; returns
    (block, r) f32.  r must be a 128-multiple."""
    m_, tm, nbins = cand.slabs.shape
    assert cand.uid_cols is not None, "see matvec_t_pallas"
    groups = cand.uid_cols.shape[0]
    n, r = y.shape
    assert n == groups * nbins and y.dtype == jnp.bfloat16, (y.shape, n)
    has_user, uidr, start = _operands(cand)
    uidc_flat = cand.uid_cols.reshape(1, n)
    out = pl.pallas_call(
        functools.partial(_matvec_kernel, tm=tm, nbins=nbins, n_mod=m_,
                          has_user=has_user),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((m_, tm, nbins), lambda g: (0, 0, 0)),
            pl.BlockSpec((tm, 1), lambda g: (0, 0)),
            pl.BlockSpec((1, nbins), lambda g: (0, g)),
            pl.BlockSpec((nbins, r), lambda g: (g, 0)),            # y
        ],
        out_specs=pl.BlockSpec((tm, r), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((tm, r), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(cand, r)),
        interpret=interpret,
    )(start, cand.slabs, uidr, uidc_flat, y)
    return out


# ---------------------------------------------------------------------------
# XLA emulation (CPU path + test oracle)
# ---------------------------------------------------------------------------


def dense_tile_reference(cand: CandBlock, g: int | jax.Array) -> jax.Array:
    """(block, nbins) bool fused tile of column group g — the mask the
    kernels build in VMEM, as plain XLA (the semantic reference)."""
    tm, nbins = cand.block, cand.nbins
    gi8 = jnp.asarray(g, jnp.int8)
    mask = cand.slabs[0] == gi8
    for m in range(1, cand.slabs.shape[0]):
        mask = mask | (cand.slabs[m] == gi8)
    if cand.uid_rows is not None:
        same = cand.uid_rows == cand.uid_cols[g][None, :]
        row_ids = cand.start + jnp.arange(tm)[:, None]
        col_ids = ((jnp.asarray(cand.g0, jnp.int32) + g) * nbins
                   + jnp.arange(nbins))
        mask = mask | (same & (row_ids != col_ids[None, :]))
    return mask


def dense_rows_reference(cand: CandBlock) -> jax.Array:
    """(block, n) bool fused adjacency rows — concatenated group tiles."""
    groups = cand.uid_cols.shape[0]
    return jnp.concatenate([dense_tile_reference(cand, g)
                            for g in range(groups)], axis=1)


def matvec_t_reference(cand: CandBlock, x_t: jax.Array):
    """Per-group XLA mirror of matvec_t_pallas (same tile/accumulation
    structure; bf16 operands, f32 accumulate)."""
    groups = cand.uid_cols.shape[0]
    outs, edges = [], jnp.float32(0.0)
    for g in range(groups):
        w = dense_tile_reference(cand, g).astype(jnp.bfloat16)
        outs.append(jnp.dot(x_t, w, preferred_element_type=jnp.float32))
        edges = edges + jnp.sum(w.astype(jnp.float32))
    return jnp.concatenate(outs, axis=1), edges


def matvec_reference(cand: CandBlock, y: jax.Array):
    """Per-group XLA mirror of matvec_pallas."""
    groups = cand.uid_cols.shape[0]
    nbins = cand.nbins
    out = jnp.zeros((cand.block, y.shape[1]), jnp.float32)
    for g in range(groups):
        w = dense_tile_reference(cand, g).astype(jnp.bfloat16)
        out = out + jnp.dot(w, y[g * nbins:(g + 1) * nbins],
                            preferred_element_type=jnp.float32)
    return out


def matvec_t(cand: CandBlock, x_t: jax.Array, use_kernel: bool,
             interpret: bool = False):
    if use_kernel or interpret:
        return matvec_t_pallas(cand, x_t, interpret=interpret)
    return matvec_t_reference(cand, x_t)


def matvec(cand: CandBlock, y: jax.Array, use_kernel: bool,
           interpret: bool = False):
    if use_kernel or interpret:
        return matvec_pallas(cand, y, interpret=interpret)
    return matvec_reference(cand, y)
