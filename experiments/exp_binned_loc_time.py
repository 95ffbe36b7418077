"""Measure kernel chord3 (location) and l1 (time) vs their strip paths,
plus edge agreement vs exact."""
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

window, block, k_basis = 98_304, 2048, 50
nbins = 3072
K = 8

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
t_loc = cols.tensors[kind_ix["location_xyz"]]
v_loc = cols.valids[kind_ix["location_xyz"]]
t_tim = cols.tensors[kind_ix["time"]]
v_tim = cols.valids[kind_ix["time"]]

knn_b = lambda *a: affinity.knn_adjacency_block(*a, out_dtype=jnp.bool_)


def timeit(fn, args, label):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            return acc + fn(i * block, *args)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
    try:
        np.asarray(loop(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{label:32s} FAILED {str(e)[-90:]}")
        return
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:32s} {best * 1e3:8.1f} ms/block")


def loc_strip(start, t, v):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    sim = -((tr[:, 0][:, None] - t[:, 0][None, :]) ** 2
            + (tr[:, 1][:, None] - t[:, 1][None, :]) ** 2
            + (tr[:, 2][:, None] - t[:, 2][None, :]) ** 2)
    return jnp.sum(knn_b(sim, vr, v, k_basis, start, True))


def loc_kernel(start, t, v):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    vals, grp = bs.binned_candidates_pallas(
        t, tr, v, start, metric="chord3", nbins=nbins, block=block)
    keep = bs.budgeted_keep(vals, vr, k_basis)
    return jnp.sum(bs.adjacency_from_candidates([keep], [grp], window))


def tim_strip(start, t, v):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    sim = -(jnp.abs(tr[:, :1] - t[:, 0][None, :])
            + jnp.abs(tr[:, 1:2] - t[:, 1][None, :]))
    return jnp.sum(knn_b(sim, vr, v, 3 * k_basis, start, True))


def tim_kernel(start, t, v):
    tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
    vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
    vals, grp = bs.binned_candidates_pallas(
        t, tr, v, start, metric="l1", nbins=nbins, block=block)
    keep = bs.budgeted_keep(vals, vr, 3 * k_basis)
    return jnp.sum(bs.adjacency_from_candidates([keep], [grp], window))


timeit(loc_strip, (t_loc, v_loc), "location strip")
timeit(loc_kernel, (t_loc, v_loc), "location chord3 kernel")
timeit(tim_strip, (t_tim, v_tim), "time strip")
timeit(tim_kernel, (t_tim, v_tim), "time l1 kernel")
