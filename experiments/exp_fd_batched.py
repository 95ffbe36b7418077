"""Experiment: can batching per-window FDs across a scanned group beat the
sequential per-window scan (the bench.py headline path)?

Variants (all produce per-window SWFD-ring query sketches):
  A: current — lax.scan over windows, per-window update_stream(mode=subspace)
  B: lax.scan over windows, per-window update_stream(mode=rr)
  C: vmap per-window update_stream(mode=rr) + scanned absorbs + vmap queries
  D: like C but hierarchical lanes=2/4 inside each window (smaller Grams)
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
from mused_tpu.ops import fd, swfd

d, ell, window = 1024, 64, 2048
n_windows = 32
n_total = window * n_windows
rng = np.random.default_rng(0)
rows = (rng.random((n_total, d)) < 0.05).astype(np.float32)
windows = jnp.asarray(rows.reshape(n_windows, window, d))


def timeit(f, *args, reps=3):
    # pull only the LAST window's sketch (matches bench.py; pulling all 32
    # sketches costs ~8MB = ~200ms on the 40MB/s tunnel and swamps compute)
    np.asarray(f(*args)[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(f(*args)[-1])
    return (time.perf_counter() - t0) / reps


def scan_variant(mode):
    @jax.jit
    def run(ws):
        def step(state, w):
            st = fd.update_stream(fd.init(ell, d), w, mode=mode)
            state = swfd.absorb_summary(state, st.sketch, jnp.int32(window),
                                        st.sq_frobenius, st.shrink_loss)
            sk, _, _, _ = swfd.query(state, window=window, sketch_dim=ell)
            return state, sk
        state = swfd.init(window, d, ell, block_rows=window)
        _, sks = jax.lax.scan(step, state, ws)
        return sks
    return run


def batched_variant(lanes):
    @jax.jit
    def run(ws):
        def one(w):
            # variant D (in-window vmap lanes) was measured slower and the
            # lane machinery has since been removed from ops/fd (see
            # fd.fold_sketch docstring); lanes kept only as a label here
            assert lanes == 1
            st = fd.update_stream(fd.init(ell, d), w, mode="rr")
            return st.sketch, st.sq_frobenius, st.shrink_loss
        sks, sqs, losses = jax.vmap(one)(ws)

        def absorb(state, x):
            sk, sq, loss = x
            state = swfd.absorb_summary(state, sk, jnp.int32(window), sq, loss)
            return state, state
        state0 = swfd.init(window, d, ell, block_rows=window)
        _, states = jax.lax.scan(absorb, state0, (sks, sqs, losses))
        qs = jax.vmap(
            lambda s: swfd.query(s, window=window, sketch_dim=ell)[0])(states)
        return qs
    return run


HI = jax.lax.Precision.HIGHEST


def _whiten(v):
    c = jnp.dot(v.T, v, precision=HI)
    lam_c, u_c = jnp.linalg.eigh(c)
    inv_sqrt = jnp.where(lam_c > 1e-8 * jnp.max(lam_c),
                         1.0 / jnp.sqrt(jnp.maximum(lam_c, 1e-30)), 0.0)
    w = (u_c * inv_sqrt[None, :]) @ u_c.T
    return jnp.dot(v, w, precision=HI)


def shrink_rr_implicit(s, ell, oversample=16, power_iters=2, prec=HI):
    """Gram-free Rayleigh-Ritz shrink: applies G = S S^T as two skinny
    matmuls (4*m*d*r FLOPs/application vs materializing the m^2*d Gram).

    y-trick: with y = S^T q (d, r), H = q^T G q = y^T y and
    B' = P[:, :ell]^T y^T — the Rayleigh quotient AND the reconstruction
    come from y, eliminating the final G application and the (ell, m)x(m, d)
    reconstruct matmul."""
    m2, d = s.shape
    r = min(ell + oversample, m2)
    v = jax.random.normal(jax.random.key(7), (m2, r), jnp.float32)

    for _ in range(power_iters):
        y = jnp.dot(s.T, v, precision=prec)
        v = _whiten(jnp.dot(s, y, precision=prec))
    y = jnp.dot(s.T, v, precision=prec)         # (d, r)
    h = jnp.dot(y.T, y, precision=HI)           # == q^T G q
    h = 0.5 * (h + h.T)
    _, p = jnp.linalg.eigh(h)                   # ascending
    b = jnp.dot(p[:, ::-1][:, :ell].T, y.T, precision=HI)   # (ell, d)
    delta = jnp.maximum(jnp.sum(s * s) - jnp.sum(b * b), 0.0)
    return b, delta


def batched_implicit(prec=HI, power_iters=2, oversample=16):
    @jax.jit
    def run(ws):
        def one(w):
            # per-window FD starts empty; zero sketch rows are FD no-ops so
            # the single whole-window shrink consumes the rows directly
            b, delta = shrink_rr_implicit(w, ell, prec=prec,
                                          power_iters=power_iters,
                                          oversample=oversample)
            return b, jnp.sum(w * w), delta
        sks, sqs, losses = jax.vmap(one)(ws)

        def absorb(state, x):
            sk, sq, loss = x
            state = swfd.absorb_summary(state, sk, jnp.int32(window), sq, loss)
            return state, state
        state0 = swfd.init(window, d, ell, block_rows=window)
        _, states = jax.lax.scan(absorb, state0, (sks, sqs, losses))
        qs = jax.vmap(
            lambda s: swfd.query(s, window=window, sketch_dim=ell)[0])(states)
        return qs
    return run


def fd_only_implicit():
    @jax.jit
    def run(ws):
        return jax.vmap(lambda w: shrink_rr_implicit(w, ell)[0])(ws)
    return run


def accuracy(sks):
    """spectral cov error of the LAST window's query sketch vs its rows."""
    a = rows[-window:]
    b = np.asarray(sks[-1])
    diff = a.T @ a - b.T @ b
    return float(np.linalg.norm(diff, 2))


results = {}
for name, fn in [
    ("A_scan_subspace", scan_variant("subspace")),
    ("B_scan_rr_impl", scan_variant("rr")),
    ("C_batched_rr_impl", batched_variant(1)),
]:
    try:
        sec = timeit(fn, windows)
        sks = fn(windows)
        err = accuracy(sks)
        rate = n_total / sec
        results[name] = (rate, err)
        print(f"{name:24s}  {rate/1e3:9.1f}k rows/s   cov_err {err:8.1f}")
    except Exception as e:  # noqa: BLE001
        print(f"{name:24s}  FAILED: {type(e).__name__}: {e}")

fd_bound = float(np.sum(rows[-window:] ** 2) / ell)
print(f"FD bound ||A||_F^2/ell for one window: {fd_bound:.1f}")
