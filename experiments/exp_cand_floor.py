"""Floor probe for a candidate-native huge-window fold (round-3 frontier).

docs/fd_roofline.md round-3 section: the composed 100k-window blocked FD
sketch sits at ~2.3-2.4 s and its remaining cost is candidate -> dense
block PRODUCTION for a real consumer.  Before building a candidate-native
consumer (fold products computed straight from the (keep, grp) candidate
buffers, dense block never materialized), measure the decomposition:

  1. cands-only   — 4 binned modalities' kernel + budgeted_keep, sum of
                    keeps (the irreducible similarity/selection cost)
  2. cands+conv   — + adjacency_from_candidates dense conversion (no
                    username), sum of the dense block
  3. full block   — fused_rowblock all 5 modalities (binned + username OR),
                    sum (== exp_fold_profile's pure sweep body)
  4. composed     — blocked_fd_sketch rr (the current production number)

(3)-(1) is the dense-materialization + username tax the candidate-native
fold removes from production; the fold's own dense reads go with it.

Run on the TPU host: python -u experiments/exp_cand_floor.py
"""
import os
import sys
import time
import functools

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

window, block, k_basis, ell = 98_304, 2048, 50, 64
K = 8      # in-graph reps

print("backend:", jax.default_backend(), flush=True)
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
nbins = bsel.default_nbins(window, k_max=3 * k_basis)
tn = bsel.pick_tn(window, nbins)
print(f"n={window} nbins={nbins} tn={tn} groups={window // nbins}",
      flush=True)


def timeit(fn, args, label, reps=K):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(i * block, *a)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
    np.asarray(loop(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{label:26s} {best * 1e3:8.1f} ms/block  "
          f"(x48 = {best * 48:5.2f} s/window)", flush=True)
    return best


def _binned_cands(c, start):
    """Candidate (keep, grp) per binned modality, mirroring fused_rowblock's
    kernel route for the standard 5-modality columns."""
    out = []
    for kind, t, valid in zip(c.kinds, c.tensors, c.valids):
        row_sums = None
        if kind == "tags" and isinstance(t, tuple):
            t, row_sums = t
        if kind == "username":
            continue
        tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
        vr = jax.lax.dynamic_slice_in_dim(valid, start, block, axis=0)
        metric, k = {"location_xyz": ("chord3", k_basis),
                     "time": ("l1", 3 * k_basis),
                     "tags": ("jaccard", k_basis),
                     "text_bf16": ("dot", k_basis)}[kind]
        vals, grp = bsel.binned_candidates_pallas(
            t, tr, valid, start, metric=metric, nbins=nbins, block=block,
            row_sums=row_sums, tn=tn)
        out.append((bsel.budgeted_keep(vals, vr, k), grp))
    return out


def cands_only(start, tensors, valids, idf):
    c = ba.Columns(kinds=cols.kinds, tensors=tensors, valids=valids, idf=idf)
    cands = _binned_cands(c, start)
    return sum(jnp.sum(k, dtype=jnp.float32) for k, _ in cands)


def cands_conv(start, tensors, valids, idf):
    c = ba.Columns(kinds=cols.kinds, tensors=tensors, valids=valids, idf=idf)
    cands = _binned_cands(c, start)
    adj = bsel.adjacency_from_candidates([k for k, _ in cands],
                                         [g for _, g in cands], window)
    return jnp.sum(adj, dtype=jnp.float32)


def full_block(start, tensors, valids, idf):
    c = ba.Columns(kinds=cols.kinds, tensors=tensors, valids=valids, idf=idf)
    blk = ba.fused_rowblock(c, start, block, k_basis, approx=True,
                            select="binned", nbins=nbins,
                            out_dtype=jnp.bfloat16)
    return jnp.sum(blk.astype(jnp.float32))


args = (cols.tensors, cols.valids, cols.idf)
timeit(cands_only, args, "cands only (4 binned)")
timeit(cands_conv, args, "cands + dense convert")
timeit(full_block, args, "full fused_rowblock")

# composed production number for reference
sk, _, _ = ba.blocked_fd_sketch(cols, ell=ell, block=block, k_basis=k_basis,
                                approx_knn=True, select="binned",
                                nbins=nbins, mode="subspace")
np.asarray(sk)
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    sk, _, _ = ba.blocked_fd_sketch(cols, ell=ell, block=block,
                                    k_basis=k_basis, approx_knn=True,
                                    select="binned", nbins=nbins,
                                    mode="subspace")
    np.asarray(sk)
    best = min(best, time.perf_counter() - t0)
print(f"{'composed blocked_fd rr':26s} {best:8.2f} s/window", flush=True)
