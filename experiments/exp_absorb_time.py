"""Time shrink_rr_cands (the candidate-native FD absorb) in isolation at
the BASELINE #3 shape, and its pieces (matvec_t / matvec / final split
matvec_t) — locates the absorb share of the composed 1.8 s/window.

Run on the TPU host: python -u experiments/exp_absorb_time.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mused_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from mused_tpu.data.synthetic import synthetic_events_dataframe
from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.data import features as feat
from mused_tpu.ops import blocked_affinity as ba, fd
from mused_tpu.ops.pallas import blocked_select as bsel, cand_matvec as cm
from mused_tpu.utils.config import FeatureConfig

window, block, k_basis, ell = 98_304, 2048, 50, 64
REPS = 8

print("backend:", jax.default_backend(), flush=True)
df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9,
                                seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
cols = ba.standard_columns(wf, fc)
nbins = bsel.default_nbins(window, k_max=3 * k_basis)

import functools
@functools.partial(jax.jit, static_argnames=("kinds",))
def _build(tensors, valids, idf, kinds):
    c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
    return ba.candidate_rowblock(c, 4 * block, block, k_basis, nbins, 512,
                                 True)
cand = _build(cols.tensors, cols.valids, cols.idf, cols.kinds)
jax.block_until_ready(cand.slabs)
print("slabs", cand.slabs.shape, flush=True)
sketch = jnp.asarray(np.random.default_rng(0).normal(
    size=(ell, window)).astype(np.float32))


def timeit(label, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            def nudge(x):
                if x.dtype in (jnp.float32, jnp.float64):
                    return x + acc * 1e-30
                return x
            out = fn(*jax.tree_util.tree_map(nudge, a))
            return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in
                             jax.tree_util.tree_leaves(out))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    try:
        np.asarray(loop(*args))
    except Exception as e:
        print(f"{label:24s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{label:24s} {best*1e3:8.2f} ms", flush=True)


timeit("shrink_rr_cands", lambda s: fd.shrink_rr_cands(s, cand, ell)[0],
       sketch)
x_t = jnp.asarray(np.random.default_rng(1).normal(
    size=(128, block)).astype(np.float32)).astype(jnp.bfloat16)
x2_t = jnp.concatenate([x_t, x_t], axis=0)
y = jnp.asarray(np.random.default_rng(2).normal(
    size=(window, 128)).astype(np.float32)).astype(jnp.bfloat16)
timeit("matvec_t r=128", lambda a: cm.matvec_t_pallas(cand, a)[0], x_t)
timeit("matvec_t r=256 (split)", lambda a: cm.matvec_t_pallas(cand, a)[0],
       x2_t)
timeit("matvec r=128", lambda a: cm.matvec_pallas(cand, a), y)


def build_cand(tensors, valids, idf):
    c = ba.Columns(kinds=cols.kinds, tensors=tensors, valids=valids, idf=idf)
    cb = ba.candidate_rowblock(c, 4 * block, block, k_basis, nbins, 512,
                               True)
    return (cb.slabs,)


timeit("candidate_rowblock", build_cand, cols.tensors, cols.valids,
       cols.idf)


def cand_plus_shrink(tensors, valids, idf, sketch):
    c = ba.Columns(kinds=cols.kinds, tensors=tensors, valids=valids, idf=idf)
    cb = ba.candidate_rowblock(c, 4 * block, block, k_basis, nbins, 512,
                               True)
    b, delta, edges = fd.shrink_rr_cands(sketch, cb, ell)
    return (b,)


timeit("cand_rowblock + shrink", cand_plus_shrink, cols.tensors,
       cols.valids, cols.idf, sketch)
