"""TPU benchmark of the stride-binned candidate kernel vs the strip path
(config #3 regime), plus edge recall vs exact top_k."""
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
from mused_tpu.ops.pallas import blocked_select as bs
from mused_tpu.utils.config import FeatureConfig

window, block, k_basis, ell = 98_304, 2048, 50, 64
K = 8
nbins = bs.default_nbins(window, k_max=3 * k_basis)
print("nbins:", nbins, "backend:", jax.default_backend())

df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9,
                                seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
cols = ba.standard_columns(wf, fc)
cols = jax.tree.map(lambda x: jnp.asarray(np.asarray(x))
                    if hasattr(x, "shape") else x, cols)
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
    print(f"{label:34s} {best * 1e3:8.1f} ms/block")
    return best


# --- per-modality: kernel vs strip ---
t_text = cols.tensors[kind_ix["text_bf16"]]
v_text = cols.valids[kind_ix["text_bf16"]]
t_tags, s_tags = cols.tensors[kind_ix["tags"]]
v_tags = cols.valids[kind_ix["tags"]]

knn_b = lambda *a: affinity.knn_adjacency_block(*a, out_dtype=jnp.bool_)


def text_strip(start, t, v):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    sim = jnp.dot(tr, t.T, preferred_element_type=jnp.float32)
    return jnp.sum(knn_b(sim, vr, v, k_basis, start, True))


def text_kernel(start, t, v):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    vals, grp = bs.binned_candidates_pallas(
        t, tr, v, start, metric="dot", nbins=nbins, block=block)
    keep = bs.budgeted_keep(vals, vr, k_basis)
    adj = bs.adjacency_from_candidates([keep], [grp], window)
    return jnp.sum(adj)


def tags_strip(start, t, v, s):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    s_r = jax.lax.dynamic_slice_in_dim(s, start, block, axis=0)
    inter = jnp.dot(tr, t.T, preferred_element_type=jnp.float32)
    sim = inter / jnp.maximum(s_r[:, None] + s[None, :] - inter, 1e-9)
    return jnp.sum(knn_b(sim, vr, v, k_basis, start, True))


def tags_kernel(start, t, v, s):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    vals, grp = bs.binned_candidates_pallas(
        t, tr, v, start, metric="jaccard", nbins=nbins, block=block,
        row_sums=s)
    keep = bs.budgeted_keep(vals, vr, k_basis)
    adj = bs.adjacency_from_candidates([keep], [grp], window)
    return jnp.sum(adj)


timeit(text_strip, (t_text, v_text), "text strip (dot+approx_max_k)")
timeit(text_kernel, (t_text, v_text), "text binned kernel")
timeit(tags_strip, (t_tags, v_tags, s_tags), "tags strip")
timeit(tags_kernel, (t_tags, v_tags, s_tags), "tags binned kernel")


# --- recall vs exact top_k on one block ---
@jax.jit
def text_exact_edges(t, v):
    tr = t[:block]
    sim = jnp.dot(tr, t.T, preferred_element_type=jnp.float32)
    return knn_b(sim, v[:block], v, k_basis, 0, False)


@jax.jit
def text_binned_edges(t, v):
    tr = t[:block]
    vals, grp = bs.binned_candidates_pallas(
        t, tr, v, jnp.int32(0), metric="dot", nbins=nbins, block=block)
    keep = bs.budgeted_keep(vals, v[:block], k_basis)
    return bs.adjacency_from_candidates([keep], [grp], window)


ex = np.asarray(text_exact_edges(t_text, v_text))
bn = np.asarray(text_binned_edges(t_text, v_text))
inter = np.logical_and(ex, bn).sum()
print(f"text recall vs exact: {inter}/{ex.sum()} = "
      f"{100.0 * inter / max(ex.sum(), 1):.2f}%")

# --- full sweep: binned vs strip ---
for select in ("strip", "binned"):
    nb = nbins if select == "binned" else 0
    sk, sq, loss = ba.blocked_fd_sketch(cols, ell=ell, block=block,
                                        k_basis=k_basis, approx_knn=True,
                                        select=select, nbins=nb)
    np.asarray(sk)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sk, _, _ = ba.blocked_fd_sketch(cols, ell=ell, block=block,
                                        k_basis=k_basis, approx_knn=True,
                                        select=select, nbins=nb)
        np.asarray(sk)
        best = min(best, time.perf_counter() - t0)
    print(f"full sweep [{select:6s}]              {best:8.2f} s/window")
