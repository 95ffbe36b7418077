"""Time the generalized pair kernel on tags(jaccard,int8)+text(dot,bf16)
at the BASELINE #3 shape vs the two single-metric sweeps.

Run on the TPU host: python -u experiments/exp_binned_pair_tt.py
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
from mused_tpu.ops import blocked_affinity as ba
from mused_tpu.ops.pallas import blocked_select as bsel
from mused_tpu.utils.config import FeatureConfig

window, block, k_basis = 98_304, 2048, 50
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
n = cols.n
print(f"n={n} nbins={nbins}", flush=True)

MODS = {}
for kind, t, valid in zip(cols.kinds, cols.tensors, cols.valids):
    rs = None
    if isinstance(t, tuple):
        t, rs = t
    MODS[kind] = (t, valid, rs)

tags, tags_v, tags_sums = MODS["tags"]
text, text_v, _ = MODS["text_bf16"]
print("tags", tags.shape, tags.dtype, "text", text.shape, text.dtype,
      flush=True)


def timeit(fn, args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            start = i * block
            out = fn(start, *a)
            return acc + sum(jnp.sum(o[0] > bsel.NEG / 2,
                                     dtype=jnp.float32) for o in (out,))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    try:
        np.asarray(loop(*args))
    except Exception as e:
        print(f"  FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best


for tm in (2048, 1024):
    def pair(start, tags, text, tags_v, text_v, tags_sums, tm=tm):
        tr = jax.lax.dynamic_slice_in_dim(tags, start, block, axis=0)
        xr = jax.lax.dynamic_slice_in_dim(text, start, block, axis=0)
        va, ga, vb, gb = bsel.binned_candidates_pair_pallas(
            tags, text, tr, xr, tags_v, text_v, start,
            metricA="jaccard", metricB="dot", nbins=nbins, block=block,
            row_sumsA=tags_sums, tn=512, tm=tm)
        return (va + vb,)
    dt = timeit(pair, (tags, text, tags_v, text_v, tags_sums))
    if dt:
        print(f"pair tags+text tm={tm}: {dt*1e3:7.2f} ms/block "
              f"(x48 = {dt*48:5.2f} s/window... wait, "
              f"{dt*48*1e3:6.0f} ms/window)", flush=True)

def single_tags(start, tags, tags_v, tags_sums):
    tr = jax.lax.dynamic_slice_in_dim(tags, start, block, axis=0)
    return (bsel.binned_candidates_pallas(
        tags, tr, tags_v, start, metric="jaccard", nbins=nbins,
        block=block, row_sums=tags_sums, tn=512, tm=2048)[0],)

def single_text(start, text, text_v):
    xr = jax.lax.dynamic_slice_in_dim(text, start, block, axis=0)
    return (bsel.binned_candidates_pallas(
        text, xr, text_v, start, metric="dot", nbins=nbins,
        block=block, tn=512, tm=2048)[0],)

dt1 = timeit(single_tags, (tags, tags_v, tags_sums))
dt2 = timeit(single_text, (text, text_v))
if dt1 and dt2:
    print(f"singles: tags {dt1*1e3:.2f} + text {dt2*1e3:.2f} "
          f"= {(dt1+dt2)*1e3:.2f} ms/block", flush=True)
