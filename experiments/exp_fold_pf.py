"""Time the two-pass fold's halves separately.

exp_fold_split: pure sweep 1.04, materialize+sum 1.54, fold-const-in-body
2.50, composed 3.26.  exp_fold_twopass: separate jits measured 2.93-3.02
for every G — NOT the hoped ~1.8 (variant-2 + isolated-absorb cost).  So
either P (produce+stack) costs more than variant 2, or F (absorb stacks)
costs far more than isolated-absorb extrapolation, or the alternating
dispatch drains the queue.  Measure each:

  P-only:  produce all groups, consume with a scalar sum (no F between)
  F-only:  absorb pre-materialized random bf16 stacks (no P between)
  P+F:     the real alternation (as exp_fold_twopass)
  QR scaling: jnp.linalg.qr wall at m2 = 2112 / 8256 / 32832, r=80

Run on the TPU host: python experiments/exp_fold_pf.py
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

HI = jax.lax.Precision.HIGHEST


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

    n, block, ell = 98_304, 2048, 64
    kb = 50
    df = synthetic_events_dataframe(n_rows=n + 64, n_events=6,
                                    noise_rate=0.9, seed=0)
    mods, _, _ = prepare_modalities(df, subset_size=n, binary=True,
                                    sort_by_uploaded=False, noise_rate=0.9,
                                    seed=0)
    fc = FeatureConfig()
    wf = feat.featurize_window(*mods, fc)
    cols = ba.standard_columns(wf, fc)
    nbins = bsel.default_nbins(n, k_max=150)
    common = dict(approx=True, select="binned", nbins=nbins,
                  out_dtype=jnp.bfloat16)

    def timeit(tag, fn, reps=2):
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {best:6.3f} s", flush=True)
        return best

    # --- QR scaling probe ------------------------------------------------
    for m2 in (2112, 8256, 32832):
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((m2, 80)).astype(np.float32))

        @jax.jit
        def qr_loop(x):
            def body(c, _):
                q = jnp.linalg.qr(c)[0]
                return q * 1.000001, None
            c, _ = jax.lax.scan(body, x, None, length=10)
            return jnp.sum(c)

        t = timeit(f"qr x10 (m2={m2:5d}, r=80)", lambda: qr_loop(x))
        print(f"   -> {t / 10 * 1e3:.1f} ms/qr", flush=True)

    # --- P-only / F-only / P+F -------------------------------------------
    for group in (4, 16):
        n_groups = n // (block * group)

        @functools.partial(jax.jit, static_argnames=("kinds",))
        def produce(tensors, valids, idf, kinds, gi, group=group):
            c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids,
                           idf=idf)
            def inner(carry, j):
                fused = ba.fused_rowblock(c, carry + j * block, block, kb,
                                          **common)
                return carry, fused
            _, blocks = jax.lax.scan(inner, gi * (group * block),
                                     jnp.arange(group))
            return blocks.reshape(group * block, n)

        @jax.jit
        def absorb(sketch, sq, loss, rows):
            sq = sq + jnp.sum(jnp.square(rows.astype(jnp.float32)))
            sketch, delta = fd.shrink_rr_pair(sketch, rows, ell)
            return sketch, sq, loss + delta

        touch = jax.jit(lambda x: x[0, 0].astype(jnp.float32))

        def p_only():
            accs = []
            for gi in range(n_groups):
                o = produce(cols.tensors, cols.valids, cols.idf,
                            cols.kinds, jnp.int32(gi))
                accs.append(touch(o))            # big buffer freed after this
            return accs

        rand_stack = jax.device_put(jnp.asarray(
            (np.random.default_rng(1).random((group * block, n)) < 0.01)
            .astype(np.float32))).astype(jnp.bfloat16)

        def f_only():
            sketch = jnp.zeros((ell, n), jnp.float32)
            sq = jnp.zeros(())
            loss = jnp.zeros(())
            for _ in range(n_groups):
                sketch, sq, loss = absorb(sketch, sq, loss, rand_stack)
            return sketch, sq, loss

        def pf():
            sketch = jnp.zeros((ell, n), jnp.float32)
            sq = jnp.zeros(())
            loss = jnp.zeros(())
            for gi in range(n_groups):
                rows = produce(cols.tensors, cols.valids, cols.idf,
                               cols.kinds, jnp.int32(gi))
                sketch, sq, loss = absorb(sketch, sq, loss, rows)
            return sketch, sq, loss

        print(f"--- G={group} ({n_groups} groups)", flush=True)
        timeit("  P-only", p_only)
        timeit("  F-only", f_only)
        timeit("  P + F ", pf)


if __name__ == "__main__":
    main()
