"""Ablate the binned-select kernel epilogue: dot-only vs +mask vs +vals
vs +grp, to find where the ~15 ms/block beyond the dot goes."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mused_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

window, block, tn, nbins = 98_304, 2048, 512, 2048
tm = 1024
K = 8
NEG = -1e30

rng = np.random.default_rng(0)
t_text = jnp.asarray(
    rng.standard_normal((window, 4096)).astype(np.float32)).astype(
        jnp.bfloat16)
colv = jnp.ones((1, window), jnp.float32)


def make(phase):
    def kern(start_ref, cols_ref, rows_ref, colv_ref, vals_ref, grp_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        wraps = nbins // tn
        g = j // wraps
        slot0 = (j % wraps) * tn

        @pl.when(j == 0)
        def _():
            vals_ref[:] = jnp.full((tm, nbins), NEG, jnp.float32)
            grp_ref[:] = jnp.zeros((tm, nbins), jnp.int8)

        sim = jnp.dot(rows_ref[:], cols_ref[:].T,
                      preferred_element_type=jnp.float32)
        if phase >= 1:     # + col/self masking (iotas + compares + where)
            start = start_ref[0, 0]
            col0 = j * tn
            col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
            row_ids = (start + i * tm
                       + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0))
            mask = (colv_ref[:] > 0) & (row_ids != col_ids)
            sim = jnp.where(mask, sim, NEG)
        slot = pl.multiple_of(slot0, tn)
        if phase >= 2:     # + vals RMW
            old = vals_ref[:, pl.ds(slot, tn)]
            take = sim > old
            vals_ref[:, pl.ds(slot, tn)] = jnp.where(take, sim, old)
        else:              # write-only so the dot isn't DCE'd
            vals_ref[:, pl.ds(slot, tn)] = sim
        if phase >= 3:     # + grp int8 RMW
            grp_ref[:, pl.ds(slot, tn)] = jnp.where(
                take, jnp.int8(g), grp_ref[:, pl.ds(slot, tn)])

    @functools.partial(jax.jit, static_argnames=())
    def run(cols, rows, colv, start):
        return pl.pallas_call(
            kern,
            grid=(block // tm, window // tn),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tn, 4096), lambda i, j: (j, 0)),
                pl.BlockSpec((tm, 4096), lambda i, j: (i, 0)),
                pl.BlockSpec((1, tn), lambda i, j: (0, j)),
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
                vmem_limit_bytes=100 << 20),
        )(start, cols, rows, colv)
    return run


start = jnp.zeros((1, 1), jnp.int32)
for phase, label in ((0, "dot + write-through"),
                     (1, "+ mask (iotas/where)"),
                     (2, "+ vals f32 RMW"),
                     (3, "+ grp int8 RMW (full)")):
    run = make(phase)

    @jax.jit
    def loop(cols, colv):
        def body(i, acc):
            rows = jax.lax.dynamic_slice_in_dim(cols, i * block, block, 0)
            st = jnp.reshape(i * block, (1, 1)).astype(jnp.int32)
            v, g = run(cols, rows, colv, st)
            return acc + v[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    try:
        np.asarray(loop(t_text, colv))
    except Exception as e:  # noqa: BLE001
        print(f"{label:26s} FAILED {str(e)[-80:]}")
        continue
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(t_text, colv))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:26s} {best * 1e3:8.1f} ms/block")
