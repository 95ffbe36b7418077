"""Why does the FD fold cost ~32 ms/absorb composed when an isolated
shrink_rr_pair absorb is 5 ms (exp_rr_tune)?

Hypothesis: the binned-select block is produced as a candidate-broadcast
(adjacency_from_candidates: compare+or over (block, groups, nbins) per
modality) that XLA re-fuses into EVERY consumer — each of the fold's
three rows-sized dot-operand loads pays the broadcast again on the VPU,
serialized against the MXU pipeline, instead of reading a clean bf16
buffer.  An optimization_barrier on the fused block forces one HBM
materialization (~402 MB bf16, ~0.5 ms) and clean loads after.

Variants (n=98304, block=2048, ell=64, binned select, mode=rr):
  1. pure sweep (sum only)            — baseline block-production cost
  2. blocked_fd_sketch as-is          — the 2.60 s composed number
  3. fold with optimization_barrier   — materialize block, then absorb
  4. barrier + cond-free absorb       — also skip the any(rows!=0) gate

Run on the TPU host: python experiments/exp_fold_fuse.py
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
        np.asarray(jax.tree_util.tree_leaves(fn())[0])  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best, out

    common = dict(approx=True, select="binned", nbins=nbins,
                  out_dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("kinds",))
    def pure_sweep(tensors, valids, idf, kinds):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        def f(acc, fused, start):
            return acc + jnp.sum(fused, dtype=jnp.float32)
        return ba._scan_blocks(c, block, kb, f, jnp.zeros((), jnp.float32),
                               **common)

    t, _ = timeit(lambda: pure_sweep(cols.tensors, cols.valids, cols.idf,
                                     cols.kinds))
    print(f"1 pure sweep:            {t:5.2f} s", flush=True)

    def run_fold(fold_f):
        @functools.partial(jax.jit, static_argnames=("kinds",))
        def go(tensors, valids, idf, kinds):
            c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids,
                           idf=idf)
            return ba._scan_blocks(c, block, kb, fold_f, fd.init(ell, n),
                                   **common)
        t, out = timeit(lambda: go(cols.tensors, cols.valids, cols.idf,
                                   cols.kinds))
        return t, out

    def f_asis(state, fused, start):
        return fd.update_stream(state, fused, mode="rr")

    t2, out2 = run_fold(f_asis)
    print(f"2 fold as-is:            {t2:5.2f} s  (fold {t2 - t:5.2f})",
          flush=True)

    def f_barrier(state, fused, start):
        return fd.update_stream(state, jax.lax.optimization_barrier(fused),
                                mode="rr")

    t3, out3 = run_fold(f_barrier)
    print(f"3 fold + barrier:        {t3:5.2f} s  (fold {t3 - t:5.2f})",
          flush=True)

    def f_nocond(state, fused, start):
        fused = jax.lax.optimization_barrier(fused)
        sk, delta = fd.shrink_rr_pair(state.sketch, fused, state.ell)
        return fd.FDState(
            sketch=sk,
            sq_frobenius=state.sq_frobenius
            + jnp.sum(jnp.square(fused.astype(jnp.float32)),
                      dtype=jnp.float32),
            shrink_loss=state.shrink_loss + delta,
            count=state.count + fused.shape[0])

    t4, out4 = run_fold(f_nocond)
    print(f"4 barrier + cond-free:   {t4:5.2f} s  (fold {t4 - t:5.2f})",
          flush=True)

    # sanity: same sketch Gram to rounding (same math, same blocks)
    z = jax.random.normal(jax.random.key(1), (n, 64), jnp.float32)

    @jax.jit
    def gz(b):
        hi = jax.lax.Precision.HIGHEST
        return jnp.dot(b.T, jnp.dot(b, z, precision=hi), precision=hi)

    g2 = gz(out2.sketch)
    s = float(jnp.max(jnp.abs(g2)))
    for tag, o in (("3", out3), ("4", out4)):
        dev = float(jnp.max(jnp.abs(gz(o.sketch) - g2))) / max(s, 1e-30)
        print(f"   variant {tag} probe dev vs 2: {dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
