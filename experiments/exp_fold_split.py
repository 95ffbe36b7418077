"""Split the composed-fold overhead: materialization vs fold-in-context.

Facts so far (n=98304, block=2048, ell=64, binned select, bf16 blocks):
  pure sweep (sum consumer)            1.04 s
  composed blocked_fd_sketch (rr)      2.50 s   -> "fold" 1.46 s
  + optimization_barrier               2.57 s   (not consumer re-fusion)
  isolated shrink_rr_pair absorb       3-5 ms   (even with varying blocks,
                                                 any layout/precision)
48 absorbs x 5 ms = 0.24 s != 1.46 s.  Two suspects remain:
  (a) forcing the fused block to MATERIALIZE (the sum consumer lets XLA
      reduce the candidate broadcast in registers; any matmul consumer
      forces the 402 MB write and breaks the production fusion apart), or
  (b) the fold subgraph coexisting with production in one scan body
      (scheduling/liveness).

Variants:
  1. pure sweep: sum(fused)                          — baseline
  2. sum(optimization_barrier(fused))                — materialize, cheap consumer
  3. production + cheap sum; fold absorbs a rolled CONSTANT buffer
     (full fold math in the same scan body, block never feeds it)
  4. composed as-is (fold absorbs the produced block)

Run on the TPU host: python experiments/exp_fold_split.py
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
    rng = np.random.default_rng(3)
    const_rows = jax.device_put(jnp.asarray(
        (rng.random((block, n)) < (100.0 / n)).astype(np.float32),
        jnp.bfloat16))
    print(f"n={n} nbins={nbins}", flush=True)

    def timeit(fn, reps=2):
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    common = dict(approx=True, select="binned", nbins=nbins,
                  out_dtype=jnp.bfloat16)

    def run(fold_f, init):
        @functools.partial(jax.jit, static_argnames=("kinds",))
        def go(tensors, valids, idf, kinds, extra):
            c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids,
                           idf=idf)
            return ba._scan_blocks(c, block, kb,
                                   functools.partial(fold_f, extra=extra),
                                   init, **common)
        return timeit(lambda: go(cols.tensors, cols.valids, cols.idf,
                                 cols.kinds, const_rows))

    def f_sum(acc, fused, start, extra):
        return acc + jnp.sum(fused, dtype=jnp.float32)

    t1 = run(f_sum, jnp.zeros((), jnp.float32))
    print(f"1 pure sweep:                 {t1:5.2f} s", flush=True)

    def f_sum_bar(acc, fused, start, extra):
        return acc + jnp.sum(jax.lax.optimization_barrier(fused),
                             dtype=jnp.float32)

    t2 = run(f_sum_bar, jnp.zeros((), jnp.float32))
    print(f"2 materialize + sum:          {t2:5.2f} s", flush=True)

    def f_fold_const(state, fused, start, extra):
        st, acc = state
        rows_i = jnp.roll(extra, start * 7, axis=1)
        return (fd.update_stream(st, rows_i, mode="rr"),
                acc + jnp.sum(fused, dtype=jnp.float32)), None

    def f_fold_const_wrap(state, fused, start, extra):
        out, _ = f_fold_const(state, fused, start, extra)
        return out

    t3 = run(f_fold_const_wrap, (fd.init(ell, n), jnp.zeros((), jnp.float32)))
    print(f"3 production+sum, fold const: {t3:5.2f} s", flush=True)

    def f_asis(state, fused, start, extra):
        return fd.update_stream(state, fused, mode="rr")

    t4 = run(f_asis, fd.init(ell, n))
    print(f"4 composed as-is:             {t4:5.2f} s", flush=True)


if __name__ == "__main__":
    main()
