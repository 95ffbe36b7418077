"""Stable orthonormalization for the rr shrink: QR vs eigh-whiten.

exp_fold_diverge showed shrink_rr_pair diverging after ~16 sequential
absorbs of real adjacency blocks: the eigh-whiten's Gram c = v^T v has
condition ~ kappa(G)^2 (v = G v0), which passes f32's 1e-7 floor once the
sketch's spectral spread grows with the stream; noise eigenvalues above
the 1e-8 cutoff amplify, Q^T Q <= I breaks, and energy compounds.

Candidates (absorbing 48 DIFFERENT rolled decaying-spectrum blocks so the
divergence reproduces, zero-init sketch like the real fold):
  A. eigh-whiten (current)              — expect divergence
  B. jnp.linalg.qr on the G-applied v   — unconditionally stable
  C. whiten-then-qr                      — cheaper? (qr on whitened v)
Report per-variant: wall/absorb, final max|sketch|, true probe err.

Run on the TPU host: python experiments/exp_rr_qr.py
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


def rr_pair(sketch, rows, ell, *, oversample=16, orth="eigh"):
    ellr, d = sketch.shape
    m = rows.shape[0]
    m2 = ellr + m
    r = min(ell + oversample, m2)
    rows_f = rows.astype(jnp.float32)

    def _whiten(v):
        c = jnp.dot(v.T, v, precision=HI)
        lam_c, u_c = jnp.linalg.eigh(c)
        inv_sqrt = jnp.where(lam_c > 1e-8 * jnp.max(lam_c),
                             1.0 / jnp.sqrt(jnp.maximum(lam_c, 1e-30)), 0.0)
        w = (u_c * inv_sqrt[None, :]) @ u_c.T
        return jnp.dot(v, w, precision=HI)

    def _orth(v):
        if orth == "eigh":
            return _whiten(v)
        if orth == "qr":
            return jnp.linalg.qr(v)[0]
        if orth == "whiten_qr":
            return jnp.linalg.qr(_whiten(v))[0]
        raise ValueError(orth)

    def _st(v):
        return (jnp.dot(sketch.T, v[:ellr], precision=HI)
                + jnp.dot(rows_f.T, v[ellr:], precision=HI))

    def _s(y):
        return jnp.concatenate([jnp.dot(sketch, y, precision=HI),
                                jnp.dot(rows_f, y, precision=HI)], axis=0)

    v = jax.random.normal(jax.random.key(7), (m2, r), jnp.float32)
    v = _orth(_s(_st(v)))
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

    n, ell, block, reps = 98_304, 64, 2048, 48
    rng = np.random.default_rng(3)
    # decaying-spectrum structured blocks: a few heavy shared directions +
    # sparse noise — mimics real adjacency (event clusters), reproduces the
    # conditioning growth that flat random blocks do not
    k_ev = 12
    basis = rng.standard_normal((k_ev, n)).astype(np.float32)
    basis /= np.linalg.norm(basis, axis=1, keepdims=True)
    weights = (rng.random((block, k_ev)) < 0.3) * rng.random((block, k_ev)) * 8
    low = weights.astype(np.float32) @ basis
    sparse = (rng.random((block, n)) < (100.0 / n)).astype(np.float32)
    rows_np = low + sparse
    rows_bf = jax.device_put(jnp.asarray(rows_np, jnp.bfloat16))
    z = jax.random.normal(jax.random.key(1), (n, 64), jnp.float32)

    def fold(absorb):
        @jax.jit
        def run(rw):
            def body(carry, i):
                s, gz = carry
                rows_i = jnp.roll(rw, i * 131, axis=1)
                s2, dlt = absorb(s, rows_i)
                rf = rows_i.astype(jnp.float32)
                gz = gz + jax.lax.dot_general(
                    rf, jnp.dot(rf, z, precision=HI),
                    (((0,), (0,)), ((), ())), precision=HI)
                return (s2, gz), dlt
            init = (jnp.zeros((ell, n), jnp.float32), jnp.zeros((n, 64)))
            (s, gz), dl = jax.lax.scan(body, init, jnp.arange(reps))
            return s, gz, jnp.sum(dl)

        out = run(rows_bf)
        np.asarray(out[2])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(rows_bf)
            np.asarray(out[2])
            best = min(best, time.perf_counter() - t0)
        return best / reps, out

    def report(tag, absorb):
        t, (s, gz, dl) = fold(absorb)
        bz = jnp.dot(s.T, jnp.dot(s, z, precision=HI), precision=HI)
        err = float(jnp.max(jnp.abs(bz - gz))) / float(jnp.max(jnp.abs(gz)))
        print(f"{tag}: {t * 1e3:7.1f} ms/absorb   max|sketch| "
              f"{float(jnp.max(jnp.abs(s))):10.4g}   probe err {err:.3f}   "
              f"loss {float(dl):.3e}", flush=True)

    for orth in ("eigh", "qr", "whiten_qr"):
        report(f"{orth:10}", functools.partial(rr_pair, ell=ell, orth=orth))


if __name__ == "__main__":
    main()
