"""Large-tile sweep for the binned-select kernel: fewer grid steps to
amortize the ~45us/step overhead seen at tn=256/512."""
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
from mused_tpu.ops import blocked_affinity as ba
from mused_tpu.ops.pallas import blocked_select as bs
from mused_tpu.utils.config import FeatureConfig

window, block, k_basis = 98_304, 2048, 50
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
t_text = cols.tensors[kind_ix["text_bf16"]]
v_text = cols.valids[kind_ix["text_bf16"]]
t_tags, s_tags = cols.tensors[kind_ix["tags"]]
v_tags = cols.valids[kind_ix["tags"]]


def bench(metric, t, v, s, tm, tn, nbins, label):
    if nbins % tn and tn % nbins:
        return
    def fn(start, t, v, s):
        tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
        vr = jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
        vals, idx = bs.binned_candidates_pallas(
            t, tr, v, start, metric=metric, nbins=nbins, block=block,
            row_sums=s if metric == "jaccard" else None, tm=tm, tn=tn)
        cand = bs.candidates_topk(vals, idx, vr, k_basis, window)
        rows2 = jnp.broadcast_to(jnp.arange(block)[:, None], cand.shape)
        adj = jnp.zeros((block, window), jnp.bool_).at[rows2, cand].max(
            jnp.ones(cand.shape, jnp.bool_))
        return jnp.sum(adj)

    @jax.jit
    def loop(t, v, s):
        def body(i, acc):
            return acc + fn(i * block, t, v, s)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    try:
        np.asarray(loop(t, v, s))
    except Exception as e:   # noqa: BLE001
        print(f"{label:34s} FAILED {type(e).__name__}: {str(e)[-90:]}")
        return
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(t, v, s))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:34s} {best * 1e3:8.1f} ms/block")


for tm, tn, nb in ((1024, 1024, 2048), (1024, 2048, 2048),
                   (2048, 1024, 2048), (512, 2048, 2048),
                   (1024, 1024, 3072), (1024, 3072, 3072)):
    bench("dot", t_text, v_text, None, tm, tn, nb,
          f"text tm={tm} tn={tn} nbins={nb}")
for tm, tn, nb in ((2048, 1024, 2048), (2048, 2048, 2048),
                   (2048, 4096, 2048), (2048, 3072, 3072),
                   (1024, 2048, 2048)):
    bench("jaccard", t_tags, v_tags, s_tags, tm, tn, nb,
          f"tags tm={tm} tn={tn} nbins={nb}")
