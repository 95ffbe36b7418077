"""Grouped FD fold: produce G sweep blocks in an INNER scan (body identical
to the pure sweep), stack them, fold ONCE per group.

Why (trace evidence, exp_fold_trace + timeline): in the composed
one-absorb-per-block scan, the fold subgraph's VMEM residents (25 MB
sketch + 31 MB (n, r) intermediates pinned by memory-space assignment
across the WHOLE loop body) slow the production side's mid-size
copies/broadcasts/reduces ~10x (e.g. the s32[2048,12,128] top-k layout
copies: 0.015 ms in the pure sweep, 0.61 ms composed).  Kernels, sorts
and the fold math itself are unchanged — the tax is scheduling/VMEM
interference.  Splitting production into its own inner while-loop gives
the scheduler the pure-sweep body back, and absorbing G*2048 rows per
shrink amortizes the fold (bigger absorbs measured faster AND more
accurate throughout round 2).

Variants (n=98304, block=2048, ell=64):
  1. composed as-is (baseline ~2.5 s)
  2. grouped, G=4  (1.6 GB bf16 buffer)
  3. grouped, G=8  (3.2 GB)
Accuracy: true covariance probe err vs the exactly-accumulated Gram.

Run on the TPU host: python experiments/exp_fold_grouped.py
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

    common = dict(approx=True, select="binned", nbins=nbins,
                  out_dtype=jnp.bfloat16)

    # exact Gram probe (production + accumulate only)
    z_np = np.random.default_rng(0).standard_normal((n, 64)).astype(np.float32)
    z = jax.device_put(jnp.asarray(z_np))

    @functools.partial(jax.jit, static_argnames=("kinds",))
    def exact_gz(tensors, valids, idf, kinds, zz):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        def f(acc, fused, start):
            rf = fused.astype(jnp.float32)
            return acc + jax.lax.dot_general(
                rf, jnp.dot(rf, zz, precision=HI), (((0,), (0,)), ((), ())),
                precision=HI)
        return ba._scan_blocks(c, block, kb, f, jnp.zeros((n, 64)), **common)

    gz = exact_gz(cols.tensors, cols.valids, cols.idf, cols.kinds, z)
    gs = float(jnp.max(jnp.abs(gz)))

    def report(tag, fn):
        t, out = timeit(fn)
        sk, sq, loss = out
        bz = jnp.dot(sk.T, jnp.dot(sk, z, precision=HI), precision=HI)
        err = float(jnp.max(jnp.abs(bz - gz))) / gs
        print(f"{tag}: {t:5.2f} s   probe err {err:.3f}   loss {float(loss):.3e}",
              flush=True)

    report("1 as-is      ", lambda: ba.blocked_fd_sketch(
        cols, ell=ell, block=block, k_basis=kb, approx_knn=True,
        select="binned", nbins=nbins, mode="subspace"))

    def grouped(tensors, valids, idf, kinds, group):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        n_groups = n // (block * group)

        def inner(carry, j):
            start = carry * block + j * block
            fused = ba.fused_rowblock(c, start, block, kb, **common)
            return carry, fused

        def outer(state, gi):
            _, blocks = jax.lax.scan(inner, gi * group, jnp.arange(group))
            state = fd.update_stream(state, blocks.reshape(group * block, n),
                                     block_rows=group * block, mode="rr")
            return state, None

        state, _ = jax.lax.scan(outer, fd.init(ell, n), jnp.arange(n_groups))
        return state.sketch, state.sq_frobenius, state.shrink_loss

    for g in (4, 8):
        go = jax.jit(functools.partial(grouped, group=g),
                     static_argnames=("kinds",))
        report(f"2 grouped G={g}", functools.partial(
            go, cols.tensors, cols.valids, cols.idf, cols.kinds))


if __name__ == "__main__":
    main()
