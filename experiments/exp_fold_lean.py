"""Lean fold-absorb variants for the huge-window blocked FD sketch.

exp_fold_where measured shrink_rr_pair ALONE at 4.8 ms/absorb on the
(2048, 98304) fold — yet the integrated fold costs ~29 ms/absorb
(exp_fold_profile: total minus pure sweep).  The difference is
update_stream/update_block scaffolding, each step a FULL pass (or copy)
of the 402 MB block: reshape-to-chunks + inner lax.scan slice
(update_stream), where(valid), any(rows != 0) + lax.cond operand
handling, and the separate sq_frobenius square-sum.

Variants (all numerically equivalent on real sweep blocks):
  V0 f = fd.update_stream(state, fused)        — current production fold
  V1 f = fd.update_block(state, fused, None)   — no reshape/chunks/scan
  V2 lean: shrink_rr_pair + inline sq sum      — no where/any/cond

Run on the TPU host: python experiments/exp_fold_lean.py
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.utils.runtime import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    from mused_tpu.data import features as feat
    from mused_tpu.ops import blocked_affinity as ba
    from mused_tpu.ops import fd
    from mused_tpu.ops.pallas import blocked_select as bsel
    from mused_tpu.utils.config import FeatureConfig

    n, block, ell, kb = 98_304, 2048, 64, 50
    df = synthetic_events_dataframe(n_rows=n + 64, n_events=6,
                                    noise_rate=0.9, seed=0)
    mods, _, _ = prepare_modalities(df, subset_size=n, binary=True,
                                    sort_by_uploaded=False, noise_rate=0.9,
                                    seed=0)
    fc = FeatureConfig()
    wf = feat.featurize_window(*mods, fc)
    cols = ba.standard_columns(wf, fc)
    nbins = bsel.default_nbins(n, k_max=150)
    print(f"n={n} nbins={nbins}", flush=True)

    def timeit(fn, reps=2):
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best, out

    @functools.partial(jax.jit, static_argnames=("kinds", "variant"))
    def fold(tensors, valids, idf, kinds, variant):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)

        if variant == "v0":
            def f(state, fused, start):
                return fd.update_stream(state, fused, mode="rr")
        elif variant == "v1":
            def f(state, fused, start):
                return fd.update_block(state, fused, None, mode="rr")
        else:
            def f(state, fused, start):
                if variant == "v3":
                    # force ONE materialization of the block: without it the
                    # candidates->dense broadcast expansion fuses into every
                    # consumer dot and the block regenerates per read
                    fused = jax.lax.optimization_barrier(fused)
                sk, delta = fd.shrink_rr_pair(state.sketch, fused, ell)
                sq = jnp.sum(jnp.square(fused.astype(jnp.float32)),
                             dtype=jnp.float32)
                return fd.FDState(
                    sketch=sk,
                    sq_frobenius=state.sq_frobenius + sq,
                    shrink_loss=state.shrink_loss + delta,
                    count=state.count + fused.shape[0])

        st = ba._scan_blocks(c, block, kb, f, fd.init(ell, n),
                             approx=True, select="binned", nbins=nbins,
                             out_dtype=jnp.bfloat16)
        return st.sketch, st.sq_frobenius, st.shrink_loss

    args = (cols.tensors, cols.valids, cols.idf, cols.kinds)
    variants = sys.argv[1:] or ["v2", "v1", "v0"]
    outs = {}
    for v in variants:
        print(f"[{time.strftime('%H:%M:%S')}] compiling {v}...", flush=True)
        t, outs[v] = timeit(lambda v=v: fold(*args, v))
        print(f"{v}: {t:.2f} s total "
              f"({t / (n // block) * 1e3:.1f} ms/block incl. sweep)",
              flush=True)

    if len(outs) > 1:
        # agreement: same sketch Gram to rounding
        z = jax.random.normal(jax.random.key(1), (n, 64), jnp.float32)

        @jax.jit
        def gz(b):
            return jnp.dot(b.T, jnp.dot(b, z))
        ref = variants[0]
        g0 = gz(outs[ref][0])
        scale = float(jnp.max(jnp.abs(g0)))
        for v in variants[1:]:
            dev = float(jnp.max(jnp.abs(gz(outs[v][0]) - g0))) / scale
            dsq = abs(float(outs[v][1]) - float(outs[ref][1]))
            dls = abs(float(outs[v][2]) - float(outs[ref][2]))
            print(f"{v} vs {ref}: probe dev {dev:.2e}  d_sq {dsq:.3g}  "
                  f"d_loss {dls:.3g}", flush=True)


if __name__ == "__main__":
    main()
