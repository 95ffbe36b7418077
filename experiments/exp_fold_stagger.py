"""Staggered / unrolled FD fold variants for the huge-window blocked sketch.

State of play (exp_fold_profile / exp_fold_pf / exp_rr_tune, v5e, n=98304,
block=2048, ell=64, binned select): pure sweep 1.04 s; composed
blocked_fd_sketch 2.33 s after the DEFAULT-precision power products —
i.e. the fold still pays ~27 ms/absorb composed vs ~5 ms isolated, and the
gap is XLA scheduling/VMEM interference between the absorb subgraph and the
block production inside one scan body (exp_fold_fuse/grouped/twopass all
localized it there; restructuring into inner scans or two programs did NOT
recover it).

Two structural ideas neither prior probe tried:

  B. STAGGER: the body produces block i and absorbs block i-1 (carried) —
     the two subgraphs become data-INDEPENDENT inside one body, so the
     scheduler can overlap the absorb's MXU passes with production's
     VPU-heavy select/sort instead of serializing produce -> absorb.
     Numerically identical to the baseline (same absorb sequence; the
     initial zero block is an exact FD no-op).
  C. UNROLL-2: two fused_rowblock calls inlined per body (no inner scan),
     one (2*block, n) absorb — half the absorbs, bigger stacks (bigger
     absorbs measured faster AND more accurate all round 2), without the
     inner-while-loop structure that made exp_fold_grouped SLOWER.
  D. B + C composed: produce 2 blocks, absorb the previous 2-block stack.
  E. block=4096 baseline: halves scan length AND absorb count through the
     existing code (select kernel tiles at (4096, n) — may refuse to
     compile on the remote toolchain; gated).

Accuracy: device-side random probe ||B^T(Bz)|| agreement vs baseline
(B/D must match baseline's ABSORB SEQUENCE exactly: B bit-identical, D ==
C's sequence).

Run on the TPU host: python -u experiments/exp_fold_stagger.py
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 98_304
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    ell, kb = 64, 50
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
    z = jnp.asarray(np.random.default_rng(3).standard_normal((n,))
                    .astype(np.float32))

    def probe(sk):
        return jnp.dot(sk.T, jnp.dot(sk, z))

    def timeit(tag, fn, reps=2):
        out = fn()
        np.asarray(out[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        p = np.asarray(probe(out[0]))
        print(f"{tag}: {best:6.3f} s  loss={float(out[2]):.1f} "
              f"probe_norm={np.linalg.norm(p):.4f}", flush=True)
        return best, p, out

    # ---- A: baseline -----------------------------------------------------
    def base(blk=block):
        return ba.blocked_fd_sketch(cols, ell=ell, block=blk, k_basis=kb,
                                    mode="rr", approx_knn=True,
                                    select="binned", nbins=nbins)
    tA, pA, _ = timeit("A base 2048      ", base)

    # ---- B: staggered ----------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("kinds", "blk"))
    def stag(tensors, valids, idf, kinds, blk=block):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        n_blocks = n // blk

        def body(carry, i):
            state, prev = carry
            fused = ba.fused_rowblock(c, i * blk, blk, kb, **common)
            # absorb the PREVIOUS block: independent of this body's
            # production (zero init block = exact FD no-op, gated inside)
            state = fd.update_stream(state, prev, mode="rr")
            return (state, fused), None

        init = (fd.init(ell, n), jnp.zeros((blk, n), jnp.bfloat16))
        (state, last), _ = jax.lax.scan(body, init, jnp.arange(n_blocks))
        state = fd.update_stream(state, last, mode="rr")
        return state.sketch, state.sq_frobenius, state.shrink_loss

    tB, pB, _ = timeit("B stagger 2048   ",
                       lambda: stag(cols.tensors, cols.valids, cols.idf,
                                    cols.kinds))
    print(f"  B == A: {np.allclose(pA, pB, rtol=1e-5)}", flush=True)

    # ---- C: unroll-2 -----------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("kinds", "unroll"))
    def unrolled(tensors, valids, idf, kinds, unroll=2):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        n_super = n // (block * unroll)

        def body(state, i):
            parts = [ba.fused_rowblock(c, (i * unroll + j) * block, block,
                                       kb, **common)
                     for j in range(unroll)]
            rows = jnp.concatenate(parts, axis=0)
            return fd.update_stream(state, rows, mode="rr"), None

        state, _ = jax.lax.scan(body, fd.init(ell, n), jnp.arange(n_super))
        return state.sketch, state.sq_frobenius, state.shrink_loss

    tC, pC, _ = timeit("C unroll-2       ",
                       lambda: unrolled(cols.tensors, cols.valids, cols.idf,
                                        cols.kinds))

    # ---- D: stagger + unroll-2 -------------------------------------------
    @functools.partial(jax.jit, static_argnames=("kinds", "unroll"))
    def stag_unrolled(tensors, valids, idf, kinds, unroll=2):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        n_super = n // (block * unroll)

        def body(carry, i):
            state, prev = carry
            parts = [ba.fused_rowblock(c, (i * unroll + j) * block, block,
                                       kb, **common)
                     for j in range(unroll)]
            rows = jnp.concatenate(parts, axis=0)
            state = fd.update_stream(state, prev, mode="rr")
            return (state, rows), None

        init = (fd.init(ell, n), jnp.zeros((block * 2, n), jnp.bfloat16))
        (state, last), _ = jax.lax.scan(body, init, jnp.arange(n_super))
        state = fd.update_stream(state, last, mode="rr")
        return state.sketch, state.sq_frobenius, state.shrink_loss

    tD, pD, _ = timeit("D stagger+unroll2",
                       lambda: stag_unrolled(cols.tensors, cols.valids,
                                             cols.idf, cols.kinds))
    print(f"  D == C: {np.allclose(pC, pD, rtol=1e-5)}", flush=True)

    # ---- E: block=4096 through the existing code -------------------------
    if n % 4096 or n <= 4096:
        return
    try:
        nb4 = bsel.default_nbins(n, k_max=150)
        tE, pE, _ = timeit("E base 4096      ",
                           lambda: ba.blocked_fd_sketch(
                               cols, ell=ell, block=4096, k_basis=kb,
                               mode="rr", approx_knn=True, select="binned",
                               nbins=nb4))
    except Exception as e:  # noqa: BLE001 — remote compiler may refuse
        print(f"E base 4096: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
