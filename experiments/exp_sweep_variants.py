"""Variants for the two dominant blocked-sweep modalities (text 57.6ms,
tags 28.5ms per (2048, 98304) block): fewer text split terms, manually
restructured Jaccard.  Also: edge-agreement quality of each text variant
vs the f32-HIGHEST oracle on a 16k slice."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

from mused_tpu.data.synthetic import synthetic_events_dataframe
from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.data import features as feat
from mused_tpu.ops import affinity, blocked_affinity as ba
from mused_tpu.utils.config import FeatureConfig

window, block, k_basis = 98_304, 2048, 50
K = 8

df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9, seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
cols = ba.standard_columns(wf, fc)
kind_ix = {k: i for i, k in enumerate(cols.kinds)}


def timeit(fn, args, label):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            return acc + fn(i * block, *args)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    np.asarray(loop(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:30s} {best * 1e3:8.1f} ms/block")
    return best


knn_b = lambda *a: affinity.knn_adjacency_block(*a, out_dtype=jnp.bool_)
t_split = cols.tensors[kind_ix["text_split"]]
v_text = cols.valids[kind_ix["text_split"]]
H = t_split.shape[1] // 2

# --- text variants ---
def text_terms(n_terms):
    def fn(start, t, v):
        h_c, l_c = t[:, :H], t[:, H:]
        h_r = jax.lax.dynamic_slice_in_dim(h_c, start, block, axis=0)
        l_r = jax.lax.dynamic_slice_in_dim(l_c, start, block, axis=0)
        sim = jnp.dot(h_r, h_c.T, preferred_element_type=jnp.float32)
        if n_terms >= 2:
            sim = sim + jnp.dot(h_r, l_c.T, preferred_element_type=jnp.float32)
        if n_terms >= 3:
            sim = sim + jnp.dot(l_r, h_c.T, preferred_element_type=jnp.float32)
        vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
        return jnp.sum(knn_b(sim, vr, v, k_basis, start, True))
    return fn

for nt in (3, 2, 1):
    timeit(text_terms(nt), (t_split, v_text), f"text split {nt}-term")

# --- tags variants ---
t_tags = cols.tensors[kind_ix["tags"]]
v_tags = cols.valids[kind_ix["tags"]]
s_all = jnp.sum(t_tags, axis=1)

def tags_cur(start, t, v):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    inter = jnp.dot(tr, t.T, preferred_element_type=jnp.float32)
    s_r, s_c = jnp.sum(tr, axis=1), jnp.sum(t, axis=1)
    union = s_r[:, None] + s_c[None, :] - inter
    sim = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
    return jnp.sum(knn_b(sim, vr, v, k_basis, start, True))

def tags_fused(start, t, v, s):
    # restructure so the whole post-dot chain is ONE fused expression:
    # jaccard = inter / (s_r + s_c - inter); rows/cols with s == 0 yield
    # inter == 0 -> sim 0 via the max clamp (no separate where pass)
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    s_r = jax.lax.dynamic_slice_in_dim(s, start, block, axis=0)
    inter = jnp.dot(tr, t.T, preferred_element_type=jnp.float32)
    sim = inter / jnp.maximum(s_r[:, None] + s[None, :] - inter, 1e-9)
    return jnp.sum(knn_b(sim, vr, v, k_basis, start, True))

timeit(tags_cur, (t_tags, v_tags), "tags current")
timeit(tags_fused, (t_tags, v_tags, s_all), "tags fused-expr")

# --- text quality: edge agreement vs f32-HIGHEST oracle on an 8k slice ---
m = 8_192
txt = np.asarray(t_split[:m, :H], np.float32) + np.asarray(
    t_split[:m, H:], np.float32)
xo = jnp.asarray(txt)
vo = v_text[:m]

@jax.jit
def oracle_edges(x, v):
    sim = jnp.dot(x, x.T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return affinity.knn_adjacency_block(sim, v, v, k_basis, 0, False,
                                        out_dtype=jnp.bool_)

import functools
@functools.partial(jax.jit, static_argnames=('n_terms',))
def split_edges(x, v, n_terms):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sim = jnp.dot(hi, hi.T, preferred_element_type=jnp.float32)
    if n_terms >= 2:
        sim = sim + jnp.dot(hi, lo.T, preferred_element_type=jnp.float32)
    if n_terms >= 3:
        sim = sim + jnp.dot(lo, hi.T, preferred_element_type=jnp.float32)
    return affinity.knn_adjacency_block(sim, v, v, k_basis, 0, False,
                                        out_dtype=jnp.bool_)

ref = np.asarray(oracle_edges(xo, vo))
n_edges = ref.sum()
for nt in (3, 2, 1):
    e = np.asarray(split_edges(xo, vo, nt))
    diff = np.logical_xor(e, ref).sum()
    print(f"text {nt}-term edge disagreement vs f32: "
          f"{diff} / {n_edges} ({100.0 * diff / max(n_edges, 1):.2f}%)")
