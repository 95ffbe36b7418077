"""Third binned-sweep probe (VERDICT r3 next #5): (a) ONE kernel computing
location chord3 + time l1 per column tile (two accumulator pairs, shared
grid/DMA/mask machinery — if a fixed per-sweep cost exists, the pair should
land near max(loc, time), not loc + time); (b) the tags jaccard
intersection as a REAL int8 MXU dot (preferred_element_type=int32 — the
bf16->f32 form HTTP-500s the remote compiler; int8 ops run at 2x the bf16
rate and counts are int8-exact).

Run on the TPU host: python -u experiments/exp_binned_pairs.py
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
    MODS[kind] = (t, valid, row_sums)


# -------------------------------------------------------------------------
# (a) paired loc+time kernel: one (tn, 3+2 padded) panel would misalign the
# lanes, so stream BOTH panels per tile and share grid/masks/accumulators
def _pair_kernel(start_ref, colsA_ref, colsB_ref, rowsA_ref, rowsB_ref,
                 colvA_ref, colvB_ref, valsA_ref, grpA_ref, valsB_ref,
                 grpB_ref, *, tm, tn, nbins):
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

    simA = bsel._sim_tile(rowsA_ref[:], colsA_ref[:], "chord3", None, None)
    simB = bsel._sim_tile(rowsB_ref[:], colsB_ref[:], "l1", None, None)

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
        take = sim > old
        vals_ref[:, pl.ds(slot, tn)] = jnp.where(take, sim, old)
        grp_ref[:, pl.ds(slot, tn)] = jnp.where(
            take, jnp.int8(g), grp_ref[:, pl.ds(slot, tn)])


def pair_loc_time():
    tA, vA, _ = MODS["location_xyz"]
    tB, vB, _ = MODS["time"]
    n = tA.shape[0]
    colvA = vA.astype(jnp.float32).reshape(1, n)
    colvB = vB.astype(jnp.float32).reshape(1, n)

    @jax.jit
    def loop(tA, tB, colvA, colvB):
        def body(b, acc):
            start = b * block
            trA = jax.lax.dynamic_slice_in_dim(tA, start, block, axis=0)
            trB = jax.lax.dynamic_slice_in_dim(tB, start, block, axis=0)
            outs = pl.pallas_call(
                functools.partial(_pair_kernel, tm=tm, tn=tn, nbins=nbins),
                grid=(block // tm, n // tn),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((tn, tA.shape[1]), lambda i, j: (j, 0)),
                    pl.BlockSpec((tn, tB.shape[1]), lambda i, j: (j, 0)),
                    pl.BlockSpec((tm, tA.shape[1]), lambda i, j: (i, 0)),
                    pl.BlockSpec((tm, tB.shape[1]), lambda i, j: (i, 0)),
                    pl.BlockSpec((1, tn), lambda i, j: (0, j)),
                    pl.BlockSpec((1, tn), lambda i, j: (0, j)),
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
                    vmem_limit_bytes=100 << 20),
            )(jnp.asarray(start, jnp.int32).reshape(1, 1), tA, tB, trA, trB,
              colvA, colvB)
            return acc + jnp.sum(outs[0] > NEG / 2, dtype=jnp.float32) \
                + jnp.sum(outs[2] > NEG / 2, dtype=jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    args = (tA, tB, colvA, colvB)
    try:
        np.asarray(loop(*args))
    except Exception as e:
        print(f"pair FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"loc+time pair   {best * 1e3:8.2f} ms/block "
          f"(x48 = {best * 48 * 1e3:6.0f} ms/window; separate baseline "
          f"9.07 ms)", flush=True)


# -------------------------------------------------------------------------
# (b) tags jaccard with an int8 MXU dot
def _jaccard_i8_kernel(start_ref, cols_ref, rows_ref, colv_ref, sr_ref,
                       sc_ref, vals_ref, grp_ref, *, tm, tn, nbins):
    i = pl.program_id(0)
    j = pl.program_id(1)
    wraps = nbins // tn
    g = j // wraps
    slot0 = (j % wraps) * tn

    @pl.when(j == 0)
    def _():
        vals_ref[:] = jnp.full((tm, nbins), NEG, jnp.float32)
        grp_ref[:] = jnp.zeros((tm, nbins), jnp.int8)

    inter = jnp.dot(rows_ref[:], cols_ref[:].T,
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    sim = inter / jnp.maximum(sr_ref[:] + sc_ref[:] - inter, 1e-9)

    start = start_ref[0, 0]
    col0 = j * tn
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    row_ids = (start + i * tm
               + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0))
    sim = jnp.where((colv_ref[:] > 0) & (row_ids != col_ids), sim, NEG)

    slot = pl.multiple_of(slot0, tn)
    old = vals_ref[:, pl.ds(slot, tn)]
    take = sim > old
    vals_ref[:, pl.ds(slot, tn)] = jnp.where(take, sim, old)
    grp_ref[:, pl.ds(slot, tn)] = jnp.where(
        take, jnp.int8(g), grp_ref[:, pl.ds(slot, tn)])


def tags_int8():
    t, valid, row_sums = MODS["tags"]
    t8 = t.astype(jnp.int8)
    n = t.shape[0]
    colv = valid.astype(jnp.float32).reshape(1, n)
    s_c = row_sums.astype(jnp.float32).reshape(1, n)

    @jax.jit
    def loop(t8, colv, s_c, row_sums):
        def body(b, acc):
            start = b * block
            tr = jax.lax.dynamic_slice_in_dim(t8, start, block, axis=0)
            s_r = jax.lax.dynamic_slice_in_dim(
                row_sums, start, block).astype(jnp.float32).reshape(block, 1)
            vals, grp = pl.pallas_call(
                functools.partial(_jaccard_i8_kernel, tm=tm, tn=tn,
                                  nbins=nbins),
                grid=(block // tm, n // tn),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((tn, t8.shape[1]), lambda i, j: (j, 0)),
                    pl.BlockSpec((tm, t8.shape[1]), lambda i, j: (i, 0)),
                    pl.BlockSpec((1, tn), lambda i, j: (0, j)),
                    pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
                    pl.BlockSpec((1, tn), lambda i, j: (0, j)),
                ],
                out_specs=[pl.BlockSpec((tm, nbins), lambda i, j: (i, 0)),
                           pl.BlockSpec((tm, nbins), lambda i, j: (i, 0))],
                out_shape=[
                    jax.ShapeDtypeStruct((block, nbins), jnp.float32),
                    jax.ShapeDtypeStruct((block, nbins), jnp.int8),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 << 20),
            )(jnp.asarray(start, jnp.int32).reshape(1, 1), t8, tr, colv,
              s_r, s_c)
            return acc + jnp.sum(vals > NEG / 2, dtype=jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    args = (t8, colv, s_c, row_sums)
    try:
        np.asarray(loop(*args))
    except Exception as e:
        print(f"tags-int8 FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"tags int8-dot   {best * 1e3:8.2f} ms/block "
          f"(x48 = {best * 48 * 1e3:6.0f} ms/window; bf16 baseline "
          f"7.25 ms)", flush=True)


if __name__ == "__main__":
    pair_loc_time()
    tags_int8()
