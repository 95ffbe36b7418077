"""Tune the huge-window FD fold (shrink_rr_pair) — now 60% of config #3.

exp_fold_profile measured (n=98304, block=2048, ell=64): pure sweep
1.04 s, blocked_fd_sketch rr 2.60 s => fold ~1.56 s for 48 absorbs
(~32 ms each inside the compiled scan).  Roofline: each absorb is ~3
rows-sized products of (2048, 98304) x (98304, 80) ~ 32 GF plus ~3
reads of the 402 MB bf16 block => ~6 ms — a 5x gap.

Measurement discipline (learned the hard way in this file's history):
per-dispatch timing over the tunnel is inflated by ~25 ms+ of RPC per
call and once ground the host for 20 min materializing a (98304,
98304) host Gram for the accuracy check.  Everything here runs IN-GRAPH
(lax.scan threading the sketch through `reps` sequential absorbs, like
the real fold) and compares accuracy via a device-side random probe
G z = B^T (B z).

Variants:
  A. shrink_rr_pair as-is (HIGHEST on the rows-sized dots)
  B. HIGH (3-pass) rows dots
  C. DEFAULT rows dots with bf16 operands (f32 accumulation)
  D. HIGHEST, 4096-row absorbs (two sweep blocks per shrink)
  E. C, 4096-row absorbs

Run on the TPU host: python experiments/exp_rr_tune.py
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


def rr_pair_variant(sketch, rows, ell, *, oversample=16, rows_prec=HI):
    """shrink_rr_pair with configurable precision on the rows-sized dots.
    rows_prec=DEFAULT additionally feeds the MXU bf16 operands."""
    bf16_ops = rows_prec == jax.lax.Precision.DEFAULT
    ellr, d = sketch.shape
    m = rows.shape[0]
    m2 = ellr + m
    r = min(ell + oversample, m2)
    rows_op = rows.astype(jnp.bfloat16 if bf16_ops else jnp.float32)

    def rdot(a, b):
        if bf16_ops:
            b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=rows_prec,
                                   preferred_element_type=jnp.float32)

    def _whiten(v):
        c = jnp.dot(v.T, v, precision=HI)
        lam_c, u_c = jnp.linalg.eigh(c)
        inv_sqrt = jnp.where(lam_c > 1e-8 * jnp.max(lam_c),
                             1.0 / jnp.sqrt(jnp.maximum(lam_c, 1e-30)), 0.0)
        w = (u_c * inv_sqrt[None, :]) @ u_c.T
        return jnp.dot(v, w, precision=HI)

    def _st(v):
        return (jnp.dot(sketch.T, v[:ellr], precision=HI)
                + rdot(rows_op.T, v[ellr:]))

    def _s(y):
        return jnp.concatenate([jnp.dot(sketch, y, precision=HI),
                                rdot(rows_op, y)], axis=0)

    v = jax.random.normal(jax.random.key(7), (m2, r), jnp.float32)
    v = _whiten(_s(_st(v)))
    y = _st(v)
    h = jnp.dot(y.T, y, precision=HI)
    h = 0.5 * (h + h.T)
    _, p_eig = jnp.linalg.eigh(h)
    b = jnp.dot(p_eig[:, ::-1][:, :ell].T, y.T, precision=HI)
    sq = (jnp.sum(sketch * sketch)
          + jnp.sum(jnp.square(rows.astype(jnp.float32)), dtype=jnp.float32))
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
    rows2_bf = jnp.concatenate([rows_bf, rows_bf[::-1]], axis=0)  # 4096

    REPS = 16

    def fold_time(absorb, rows, reps=REPS):
        """Wall per absorb of `reps` sequential in-graph absorbs."""
        @jax.jit
        def run(sk, rw):
            def body(s, _):
                s2, dlt = absorb(s, rw)
                return s2, dlt
            s, dl = jax.lax.scan(body, sk, None, length=reps)
            return s, jnp.sum(dl)

        out = run(sketch0, rows)
        np.asarray(out[1])                       # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(sketch0, rows)
            np.asarray(out[1])
            best = min(best, time.perf_counter() - t0)
        return best / reps, out

    # accuracy probe on device: G z with z (n, 128)
    z = jax.random.normal(jax.random.key(1), (n, 128), jnp.float32)

    @jax.jit
    def gram_apply(b):
        return jnp.dot(b.T, jnp.dot(b, z, precision=HI), precision=HI)

    base = functools.partial(fd.shrink_rr_pair, ell=ell)
    tA, outA = fold_time(base, rows_bf)
    gzA = gram_apply(outA[0])
    scale = float(jnp.max(jnp.abs(gzA)))
    print(f"A HIGHEST (in-scan):        {tA * 1e3:7.1f} ms/absorb", flush=True)

    def report(tag, absorb, rows, per_rows=block):
        t, out = fold_time(absorb, rows)
        dev = float(jnp.max(jnp.abs(gram_apply(out[0]) - gzA))) / max(scale, 1e-30)
        eff = t * block / per_rows
        print(f"{tag}: {t * 1e3:7.1f} ms/absorb ({eff * 1e3:6.1f} ms per 2048 "
              f"rows)   probe dev vs A: {dev:.2e}", flush=True)

    report("B HIGH rows dots          ",
           functools.partial(rr_pair_variant, ell=ell,
                             rows_prec=jax.lax.Precision.HIGH), rows_bf)
    report("C bf16 rows dots          ",
           functools.partial(rr_pair_variant, ell=ell,
                             rows_prec=jax.lax.Precision.DEFAULT), rows_bf)
    report("D HIGHEST 4096-row absorbs",
           functools.partial(fd.shrink_rr_pair, ell=ell), rows2_bf,
           per_rows=2 * block)
    report("E bf16 4096-row absorbs   ",
           functools.partial(rr_pair_variant, ell=ell,
                             rows_prec=jax.lax.Precision.DEFAULT), rows2_bf,
           per_rows=2 * block)


if __name__ == "__main__":
    main()
