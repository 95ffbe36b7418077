"""Locate the huge-window fold's per-absorb cost (29 ms vs ~6 ms roofline).

exp_fold_profile (post-QR/DEFAULT tuning): sweep 1.04 s, rr fold ~1.40 s
= ~29 ms per 2048-row absorb at n=98304, ell=64, r=80.  The three
rows-sized products read ~1.2 GB of bf16 => ~1.5 ms at 819 GB/s, so
something else dominates.  Suspects: jnp.linalg.qr on the (2112, 80)
iterate (Householder lowers poorly on TPU), the (80, 80) eigh (~0.5 ms
floor), the HIGHEST-precision final y (6 MXU passes), or an
unfused f32 materialization of the bf16 rows.

All variants run IN-GRAPH (lax.scan of `reps` sequential absorbs, like
the real fold).  Components are ablated one at a time; ablated variants
are NOT numerically valid shrinks — they only bound that component's
wall share.

Run on the TPU host: python experiments/exp_fold_where.py
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


def pair_variant(sketch, rows, ell, *, orth="qr", basis="eigh",
                 final_prec=HI, power_iters=1, oversample=16):
    """shrink_rr_pair with swappable components (see fd.shrink_rr_pair)."""
    ellr, d = sketch.shape
    m = rows.shape[0]
    m2 = ellr + m
    r = min(ell + oversample, m2)
    rows_f = rows.astype(jnp.float32)

    def _st(v, precision):
        return (jnp.dot(sketch.T, v[:ellr], precision=precision)
                + jnp.dot(rows_f.T, v[ellr:], precision=precision))

    def _s(y, precision):
        return jnp.concatenate([jnp.dot(sketch, y, precision=precision),
                                jnp.dot(rows_f, y, precision=precision)],
                               axis=0)

    def _orth(v):
        if orth == "qr":
            return jnp.linalg.qr(v)[0]
        if orth == "cholqr2":
            for _ in range(2):
                c = jnp.dot(v.T, v, precision=HI)
                c = c + 1e-12 * jnp.trace(c) * jnp.eye(r, dtype=c.dtype)
                rr_ = jnp.linalg.cholesky(c)
                v = jax.scipy.linalg.solve_triangular(
                    rr_, v.T, lower=True).T
            return v
        if orth == "colnorm":              # ABLATION ONLY (not orthonormal)
            return v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True),
                                   1e-30)
        raise ValueError(orth)

    v = jax.random.normal(jax.random.key(7), (m2, r), jnp.float32)
    for _ in range(power_iters):
        v = _orth(_s(_st(v, None), None))
    y = _st(v, final_prec)
    if basis == "eigh":
        h = jnp.dot(y.T, y, precision=HI)
        h = 0.5 * (h + h.T)
        _, p = jnp.linalg.eigh(h)
        b = jnp.dot(p[:, ::-1][:, :ell].T, y.T, precision=HI)
    else:                                   # ABLATION ONLY: slice, no RQ
        b = y.T[:ell]
    sq = (jnp.sum(sketch * sketch)
          + jnp.sum(jnp.square(rows_f), dtype=jnp.float32))
    delta = jnp.maximum(sq - jnp.sum(b * b), 0.0)
    return b.astype(sketch.dtype), delta.astype(sketch.dtype)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from mused_tpu.ops import fd

    n, ell, block = 98_304, 64, 2048
    rng = np.random.default_rng(3)
    rows_np = (rng.random((block, n)) < (100.0 / n)).astype(np.float32)
    sk_np = rng.standard_normal((ell, n)).astype(np.float32) * 0.5
    rows_bf = jax.device_put(jnp.asarray(rows_np, jnp.bfloat16))
    sketch0 = jax.device_put(jnp.asarray(sk_np))

    REPS = 16

    def fold_time(absorb, rows=rows_bf, reps=REPS):
        @jax.jit
        def run(sk, rw):
            def body(s, _):
                s2, dlt = absorb(s, rw)
                return s2, dlt
            s, dl = jax.lax.scan(body, sk, None, length=reps)
            return s, jnp.sum(dl)

        out = run(sketch0, rows)
        np.asarray(out[1])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(sketch0, rows)
            np.asarray(out[1])
            best = min(best, time.perf_counter() - t0)
        return best / reps

    t = fold_time(functools.partial(fd.shrink_rr_pair, ell=ell))
    print(f"A  shrink_rr_pair as-is:          {t*1e3:7.1f} ms/absorb",
          flush=True)

    for tag, kw in [
        ("B  final DEFAULT (not HIGHEST)  ", dict(final_prec=None)),
        ("C  no eigh (slice basis)        ", dict(basis="slice")),
        ("D  no QR (colnorm)              ", dict(orth="colnorm")),
        ("E  cholqr2 instead of qr        ", dict(orth="cholqr2")),
        ("F  dots only (colnorm+slice+DEF)",
         dict(orth="colnorm", basis="slice", final_prec=None)),
    ]:
        t = fold_time(functools.partial(pair_variant, ell=ell, **kw))
        print(f"{tag}: {t*1e3:7.1f} ms/absorb", flush=True)

    # isolated small-op floors, same scan discipline
    v0 = jax.random.normal(jax.random.key(0), (block + ell, 80), jnp.float32)

    def small_op_time(f, x, reps=64):
        @jax.jit
        def run(x):
            def body(c, _):
                c2 = f(c)
                return c2, jnp.sum(c2[:1, :1])
            c, s = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(s)

        np.asarray(run(x))
        t0 = time.perf_counter()
        np.asarray(run(x))
        return (time.perf_counter() - t0) / reps

    t = small_op_time(lambda v: jnp.linalg.qr(v)[0] * 1.000001, v0)
    print(f"G  qr((2112,80)) alone:           {t*1e3:7.1f} ms/call",
          flush=True)
    h0 = jax.random.normal(jax.random.key(1), (80, 80), jnp.float32)
    h0 = h0 @ h0.T

    def eig_step(h):
        _, p = jnp.linalg.eigh(h)
        return h + 1e-9 * p
    t = small_op_time(eig_step, h0)
    print(f"H  eigh((80,80)) alone:           {t*1e3:7.1f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()
