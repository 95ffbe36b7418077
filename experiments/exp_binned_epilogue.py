"""Ablate the binned-selection kernel's per-element epilogue cost
(VERDICT r3 next #5 follow-up to exp_binned_permod.py).

permod measured a tiling-INVARIANT ~3.2-3.8 ms/sweep gap over each
metric's MXU/VPU ideal (text 11.6 vs 8.4 ideal, tags 7.25 vs 4.2, loc 4.8
vs ~1) — consistent with the per-step epilogue (iota x2, self-compare,
valid-and, strict >, three where RMWs) costing ~8-10 VPU ops per sim
element.  Variants:

  v1 diag-gate   — the self-column mask (row_ids != col_ids) only matters
                   in tiles the diagonal crosses (4 of 192 at block=2048,
                   tn=512); gate the iota+compare behind a scalar overlap
                   test and keep only the cheap colv where elsewhere.
  v2 packed-key  — pack the 16-mantissa-bit-rounded sim and (127 - group)
                   into ONE orderable int32; the RMW becomes a single
                   jnp.maximum on an int32 accumulator (no int8 grp buffer,
                   half the accumulator bytes).  Tie semantics preserved:
                   equal rounded sims prefer the LOWEST group — the same
                   contract as the current strict > (at ~16-bit sim
                   precision, the split-bf16 ranking story of
                   docs/DESIGN.md §8.3).
  tags-int8      — jaccard intersection via an int8 MXU dot (2x the bf16
                   rate; counts are small ints, exact in int8 up to 127).

Run on the TPU host: python -u experiments/exp_binned_epilogue.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mused_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mused_tpu.data.synthetic import synthetic_events_dataframe
from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.data import features as feat
from mused_tpu.ops import blocked_affinity as ba
from mused_tpu.ops.pallas import blocked_select as bsel
from mused_tpu.utils.config import FeatureConfig

window, block, k_basis = 98_304, 2048, 50
REPS = 8
NEG = bsel.NEG

print("backend:", jax.default_backend(), flush=True)
df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9,
                                seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
cols = ba.standard_columns(wf, fc)
jax.block_until_ready(cols.tensors)
nbins = bsel.default_nbins(window, k_max=3 * k_basis)
tn, tm = 512, 2048
print(f"n={window} nbins={nbins} tn={tn}", flush=True)

MODS = {}
for kind, t, valid in zip(cols.kinds, cols.tensors, cols.valids):
    row_sums = None
    if isinstance(t, tuple):
        t, row_sums = t
    if kind == "username":
        continue
    metric = {"location_xyz": "chord3", "time": "l1", "tags": "jaccard",
              "text_bf16": "dot"}[kind]
    MODS[kind] = (t, valid, row_sums, metric)


# --------------------------------------------------------------------------
# v1: diagonal-gated self mask
def _kernel_v1(start_ref, cols_ref, rows_ref, colv_ref, sr_ref, sc_ref,
               vals_ref, grp_ref, *, metric, tm, tn, nbins):
    i = pl.program_id(0)
    j = pl.program_id(1)
    wraps = nbins // tn
    g = j // wraps
    slot0 = (j % wraps) * tn

    @pl.when(j == 0)
    def _():
        vals_ref[:] = jnp.full((tm, nbins), NEG, jnp.float32)
        grp_ref[:] = jnp.zeros((tm, nbins), jnp.int8)

    stats = metric in ("jaccard", "chord")
    s_r = sr_ref[:] if stats else None
    s_c = sc_ref[:] if stats else None
    sim = bsel._sim_tile(rows_ref[:], cols_ref[:], metric, s_r, s_c)
    sim = jnp.where(colv_ref[:] > 0, sim, NEG)

    start = start_ref[0, 0]
    col0 = j * tn
    row0 = start + i * tm
    diag = (col0 < row0 + tm) & (col0 + tn > row0)

    @pl.when(diag)
    def _():
        col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
        row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
        cur = vals_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)]
        # recompute the masked sim with the self column dropped; overwrite
        s = jnp.where(row_ids != col_ids, sim, NEG)
        take = s > cur
        vals_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)] = \
            jnp.where(take, s, cur)
        grp_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)] = jnp.where(
            take, jnp.int8(g),
            grp_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)])

    @pl.when(jnp.logical_not(diag))
    def _():
        cur = vals_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)]
        take = sim > cur
        vals_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)] = \
            jnp.where(take, sim, cur)
        grp_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)] = jnp.where(
            take, jnp.int8(g),
            grp_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)])


# v2: packed orderable int32 key, single max RMW
def _kernel_v2(start_ref, cols_ref, rows_ref, colv_ref, sr_ref, sc_ref,
               key_ref, *, metric, tm, tn, nbins):
    i = pl.program_id(0)
    j = pl.program_id(1)
    wraps = nbins // tn
    g = j // wraps
    slot0 = (j % wraps) * tn

    @pl.when(j == 0)
    def _():
        key_ref[:] = jnp.full((tm, nbins), jnp.iinfo(jnp.int32).min,
                              jnp.int32)

    stats = metric in ("jaccard", "chord")
    s_r = sr_ref[:] if stats else None
    s_c = sc_ref[:] if stats else None
    sim = bsel._sim_tile(rows_ref[:], cols_ref[:], metric, s_r, s_c)

    start = start_ref[0, 0]
    col0 = j * tn
    row0 = start + i * tm
    diag = (col0 < row0 + tm) & (col0 + tn > row0)

    def pack(s):
        bits = pltpu.bitcast(s, jnp.int32)
        # orderable transform: flip sign bit for positives, all bits for
        # negatives -> int order == float order
        bits = jnp.where(bits >= 0, bits ^ jnp.int32(-2147483648), ~bits)
        # round off 7 mantissa bits, pack (127 - g): equal rounded sims
        # prefer the LOWEST group
        return (bits & jnp.int32(~0x7F)) | jnp.int32(127 - g)

    def masked(s, with_diag):
        m = colv_ref[:] > 0
        if with_diag:
            col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
            row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
            m = m & (row_ids != col_ids)
        return jnp.where(m, pack(s), jnp.iinfo(jnp.int32).min)

    @pl.when(diag)
    def _():
        cur = key_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)]
        key_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)] = \
            jnp.maximum(cur, masked(sim, True))

    @pl.when(jnp.logical_not(diag))
    def _():
        cur = key_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)]
        key_ref[:, pl.ds(pl.multiple_of(slot0, tn), tn)] = \
            jnp.maximum(cur, masked(sim, False))


def run_variant(kernel, n_out, kind):
    t, valid, row_sums, metric = MODS[kind]
    n = t.shape[0]
    colv = valid.astype(jnp.float32).reshape(1, n)
    if metric == "jaccard":
        s_r0 = row_sums.astype(jnp.float32)
        s_c = row_sums.astype(jnp.float32).reshape(1, n)
    else:
        s_r0 = jnp.zeros((n,), jnp.float32)
        s_c = jnp.zeros((1, n), jnp.float32)

    out_shape = ([jax.ShapeDtypeStruct((block, nbins), jnp.float32),
                  jax.ShapeDtypeStruct((block, nbins), jnp.int8)]
                 if n_out == 2
                 else [jax.ShapeDtypeStruct((block, nbins), jnp.int32)])
    out_specs = [pl.BlockSpec((tm, nbins), lambda i, j: (i, 0))
                 for _ in range(n_out)]

    @jax.jit
    def loop(t, colv, s_c, s_r0):
        def body(b, acc):
            start = b * block
            tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
            s_r = jax.lax.dynamic_slice_in_dim(
                s_r0, start, block).reshape(block, 1)
            outs = pl.pallas_call(
                functools.partial(kernel, metric=metric, tm=tm, tn=tn,
                                  nbins=nbins),
                grid=(block // tm, n // tn),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((tn, t.shape[1]), lambda i, j: (j, 0)),
                    pl.BlockSpec((tm, t.shape[1]), lambda i, j: (i, 0)),
                    pl.BlockSpec((1, tn), lambda i, j: (0, j)),
                    pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
                    pl.BlockSpec((1, tn), lambda i, j: (0, j)),
                ],
                out_specs=out_specs, out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 << 20),
            )(jnp.asarray(start, jnp.int32).reshape(1, 1), t, tr, colv,
              s_r, s_c)
            first = outs[0]
            return acc + jnp.sum((first > (NEG / 2 if first.dtype ==
                                           jnp.float32 else -2**30))
                                 .astype(jnp.float32))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    args = (t, colv, s_c, s_r0)
    try:
        np.asarray(loop(*args))
    except Exception as e:
        print(f"{kind} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


# tags int8 dot variant: reuse the baseline kernel with an int8 panel
def tags_int8():
    t, valid, row_sums, _ = MODS["tags"]
    t8 = t.astype(jnp.int8)

    @jax.jit
    def loop(t8, valid, row_sums):
        def body(b, acc):
            start = b * block
            tr = jax.lax.dynamic_slice_in_dim(t8, start, block, axis=0)
            vals, grp = bsel.binned_candidates_pallas(
                t8, tr, valid, start, metric="jaccard", nbins=nbins,
                block=block, row_sums=row_sums, tn=tn, tm=tm)
            return acc + jnp.sum(vals > NEG / 2, dtype=jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    try:
        np.asarray(loop(t8, valid, row_sums))
    except Exception as e:
        print(f"tags-int8 FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(t8, valid, row_sums))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


if __name__ == "__main__":
    for kind in ("location_xyz", "tags", "text_bf16"):
        for name, kern, n_out in (("v1-diaggate", _kernel_v1, 2),
                                  ("v2-packed", _kernel_v2, 1)):
            dt = run_variant(kern, n_out, kind)
            if dt is not None:
                print(f"{kind:14s} {name:12s} {dt * 1e3:8.2f} ms/block "
                      f"(x48 = {dt * 48 * 1e3:6.0f} ms/window)", flush=True)
    dt = tags_int8()
    if dt is not None:
        print(f"{'tags':14s} {'int8-dot':12s} {dt * 1e3:8.2f} ms/block",
              flush=True)
