"""Validate the QR-orthonormalized rr shrink on the REAL blocked fold.

exp_fold_diverge: the production blocked_fd_sketch (rr mode) diverges at
~absorb 16-19 on the real chip.  exp_rr_qr: QR costs the same as the
eigh-whiten (5.1 vs 5.3 ms/absorb) but my synthetic stream did not
reproduce the divergence — so validate on the actual production blocks:

  1. as-is rr (eigh-whiten)            — known to diverge
  2. per-block QR rr                    — must be healthy
  3. grouped G=8 production + QR rr     — perf restructure on top
  4. eigh mode                          — accuracy yardstick

True-Gram probe for each.  Run: python experiments/exp_fold_fix.py
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


def rr_pair_qr(sketch, rows, ell, *, oversample=16):
    ellr, d = sketch.shape
    m = rows.shape[0]
    m2 = ellr + m
    r = min(ell + oversample, m2)
    rows_f = rows.astype(jnp.float32)

    def _st(v):
        return (jnp.dot(sketch.T, v[:ellr], precision=HI)
                + jnp.dot(rows_f.T, v[ellr:], precision=HI))

    def _s(y):
        return jnp.concatenate([jnp.dot(sketch, y, precision=HI),
                                jnp.dot(rows_f, y, precision=HI)], axis=0)

    v = jax.random.normal(jax.random.key(7), (m2, r), jnp.float32)
    v = jnp.linalg.qr(_s(_st(v)))[0]
    y = _st(v)
    h = jnp.dot(y.T, y, precision=HI)
    h = 0.5 * (h + h.T)
    _, p = jnp.linalg.eigh(h)
    b = jnp.dot(p[:, ::-1][:, :ell].T, y.T, precision=HI)
    sq = (jnp.sum(sketch * sketch)
          + jnp.sum(jnp.square(rows_f), dtype=jnp.float32))
    delta = jnp.maximum(sq - jnp.sum(b * b), 0.0)
    return b.astype(sketch.dtype), delta.astype(sketch.dtype)


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
    common = dict(approx=True, select="binned", nbins=nbins,
                  out_dtype=jnp.bfloat16)

    def timeit(fn, reps=2):
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best, out

    z = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((n, 64)), jnp.float32))

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
        print(f"{tag}: {t:5.2f} s   max|sk| {float(jnp.max(jnp.abs(sk))):10.4g}"
              f"   probe err {err:.3f}   loss {float(loss):.3e}", flush=True)

    report("1 as-is rr     ", lambda: ba.blocked_fd_sketch(
        cols, ell=ell, block=block, k_basis=kb, approx_knn=True,
        select="binned", nbins=nbins, mode="subspace"))

    def perblock_qr(tensors, valids, idf, kinds):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        def f(carry, fused, start):
            sk, sq, loss = carry
            b, dlt = rr_pair_qr(sk, fused, ell)
            sq = sq + jnp.sum(jnp.square(fused.astype(jnp.float32)),
                              dtype=jnp.float32)
            return (b, sq, loss + dlt)
        init = (jnp.zeros((ell, n), jnp.float32), jnp.zeros(()), jnp.zeros(()))
        return ba._scan_blocks(c, block, kb, f, init, **common)

    go2 = jax.jit(perblock_qr, static_argnames=("kinds",))
    report("2 per-block QR ", lambda: go2(cols.tensors, cols.valids,
                                          cols.idf, cols.kinds))

    def grouped_qr(tensors, valids, idf, kinds, group=8):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        n_groups = n // (block * group)

        def inner(carry, j):
            fused = ba.fused_rowblock(c, carry * block + j * block, block,
                                      kb, **common)
            return carry, fused

        def outer(carry, gi):
            sk, sq, loss = carry
            _, blocks = jax.lax.scan(inner, gi * group, jnp.arange(group))
            rows = blocks.reshape(group * block, n)
            b, dlt = rr_pair_qr(sk, rows, ell)
            sq = sq + jnp.sum(jnp.square(rows.astype(jnp.float32)),
                              dtype=jnp.float32)
            return (b, sq, loss + dlt), None

        init = (jnp.zeros((ell, n), jnp.float32), jnp.zeros(()), jnp.zeros(()))
        carry, _ = jax.lax.scan(outer, init, jnp.arange(n_groups))
        return carry

    go3 = jax.jit(grouped_qr, static_argnames=("kinds",))
    report("3 grouped G8 QR", lambda: go3(cols.tensors, cols.valids,
                                          cols.idf, cols.kinds))

    report("4 eigh         ", lambda: ba.blocked_fd_sketch(
        cols, ell=ell, block=block, k_basis=kb, approx_knn=True,
        select="binned", nbins=nbins, mode="eigh"))


if __name__ == "__main__":
    main()
