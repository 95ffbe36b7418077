"""Per-modality profile of the huge-window blocked sweep (config #3 regime).

Times one (2048, 98304) row block's sim+select per modality with in-graph
fori_loop repetition (the tunnel's ~25ms round trip would otherwise swamp
per-block costs), plus the full fused_rowblock, the FD absorb, and the whole
48-block sweep.
"""
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
from mused_tpu.ops import affinity, blocked_affinity as ba, fd
from mused_tpu.utils.config import FeatureConfig

window, block, k_basis, ell = 98_304, 2048, 50, 64
K = 8      # in-graph reps

df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9, seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
cols = ba.standard_columns(wf, fc)
# materialize columns once so timings don't include featurization
cols = jax.tree.map(lambda x: jnp.asarray(np.asarray(x))
                    if hasattr(x, "shape") else x, cols)


def timeit(fn, args, label):
    """fn(start, *args) -> scalar; args passed explicitly (a jitted closure
    over the big column tensors trips the tunnel's HTTP 413 limit).  Each
    iteration computes a DIFFERENT row block — a loop-invariant body gets
    hoisted by XLA and under-reports 8x (verified)."""
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
    print(f"{label:28s} {best * 1e3:8.1f} ms/block  "
          f"(x48 = {best * 48:5.2f} s/window)")
    return best


for i, kind in enumerate(cols.kinds):
    def one_mod(start, t, v, idf, i=i, kind=kind):
        sub = ba.Columns(kinds=(kind,), tensors=(t,), valids=(v,), idf=idf)
        blk = ba.fused_rowblock(sub, start, block, k_basis, approx=True)
        return jnp.sum(blk)
    timeit(one_mod, (cols.tensors[i], cols.valids[i], cols.idf),
           f"modality {kind}")


def full_block(start, tensors, valids, idf):
    c = ba.Columns(kinds=cols.kinds, tensors=tensors, valids=valids, idf=idf)
    blk = ba.fused_rowblock(c, start, block, k_basis, approx=True)
    return jnp.sum(blk)
timeit(full_block, (cols.tensors, cols.valids, cols.idf),
       "fused_rowblock (all 5)")


def absorb(start, _idf):
    rows = jax.random.normal(jax.random.key(0), (block, window)) \
        * (1.0 + jnp.float32(start) * 1e-30)
    st = fd.update_stream(fd.init(ell, window), rows, mode="rr")
    return jnp.sum(st.sketch)
timeit(absorb, (cols.idf,), "FD absorb (rr, 2048xN)")

# whole sweep for reference
sk, sq, loss = ba.blocked_fd_sketch(cols, ell=ell, block=block,
                                    k_basis=k_basis, approx_knn=True)
np.asarray(sk)
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    sk, _, _ = ba.blocked_fd_sketch(cols, ell=ell, block=block,
                                    k_basis=k_basis, approx_knn=True)
    np.asarray(sk)
    best = min(best, time.perf_counter() - t0)
print(f"{'full sweep (48 blocks)':28s} {best:8.2f} s/window")
