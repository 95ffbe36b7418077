"""Decisive split for the composed-fold 32 ms/absorb vs isolated 5 ms.

exp_rr_tune's scan absorbed the SAME rows buffer every iteration — XLA
hoists any loop-invariant operand prep (f32 cast, physical transpose,
HIGHEST hi/lo splits of the 402 MB block) out of the scan, so its
5 ms/absorb excludes exactly the work the real fold pays per block.

Here every scan iteration absorbs a DIFFERENT block (rolled on device,
roll cost ~0.5 ms measured separately), matching the real fold's
data flow without the block-production cost:

  A. shrink_rr_pair as-is, varying blocks        — expect ~30 ms if the
     hoisting explains the composed fold
  B. transpose-free (r, d)-layout rr_pair         — S^T v computed as
     dot_general(v, rows, contract 0, 0) so no physical transpose of
     the big operand can be inserted; y kept (r, d) throughout
  C. B + bf16 rows dots (DEFAULT precision)       — no f32 cast, no
     hi/lo splits: one pass over 402 MB per product
  D. C with HIGH on rows dots                     — 3-pass compromise

Accuracy: TRUE covariance probe — the exact Gram of the absorbed stream
is accumulated in the same scan (gz += rows_i^T (rows_i z)), so each
variant reports max |B^T B z - G z| / max |G z| (plus the roll-free
sanity that A's error matches exp_rr_tune's A).

Run on the TPU host: python experiments/exp_rr_layout.py
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


def rr_pair_layout(sketch, rows, ell, *, oversample=16, rows_prec=HI):
    """shrink_rr_pair with y kept in (r, d) layout and every big-operand
    product expressed as a dot_general that contracts ``rows`` dim 0 or 1
    directly — no transpose of the (m, d) block, large free dims stay
    minor-most.  rows_prec=DEFAULT additionally keeps bf16 operands."""
    bf16_ops = rows_prec == jax.lax.Precision.DEFAULT
    ellr, d = sketch.shape
    m = rows.shape[0]
    m2 = ellr + m
    r = min(ell + oversample, m2)
    rows_op = rows if bf16_ops and rows.dtype == jnp.bfloat16 \
        else rows.astype(jnp.bfloat16 if bf16_ops else jnp.float32)

    def dg(a, b, ca, cb, prec):
        out = jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                                  precision=prec,
                                  preferred_element_type=jnp.float32)
        return out

    def _whiten(v):
        c = jnp.dot(v.T, v, precision=HI)
        lam_c, u_c = jnp.linalg.eigh(c)
        inv_sqrt = jnp.where(lam_c > 1e-8 * jnp.max(lam_c),
                             1.0 / jnp.sqrt(jnp.maximum(lam_c, 1e-30)), 0.0)
        w = (u_c * inv_sqrt[None, :]) @ u_c.T
        return jnp.dot(v, w, precision=HI)

    def _st_T(v):        # (m2, r) -> y^T in (r, d)
        vs = v[:ellr]
        vr = v[ellr:]
        if bf16_ops:
            vr = vr.astype(jnp.bfloat16)
        return (dg(vs, sketch, 0, 0, HI)
                + dg(vr, rows_op, 0, 0, rows_prec))

    def _s(yt):          # y^T (r, d) -> S y (m2, r)
        yr = yt.astype(jnp.bfloat16) if bf16_ops else yt
        return jnp.concatenate([dg(sketch, yt, 1, 1, HI),
                                dg(rows_op, yr, 1, 1, rows_prec)], axis=0)

    v = jax.random.normal(jax.random.key(7), (m2, r), jnp.float32)
    v = _whiten(_s(_st_T(v)))
    yt = _st_T(v)                                         # (r, d)
    h = dg(yt, yt, 1, 1, HI)                              # (r, r) = y^T y
    h = 0.5 * (h + h.T)
    _, p = jnp.linalg.eigh(h)
    b = jnp.dot(p[:, ::-1][:, :ell].T, yt, precision=HI)  # (ell, d)
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
    z = jax.random.normal(jax.random.key(1), (n, 64), jnp.float32)

    REPS = 16

    def fold(absorb):
        """Scan absorbing a DIFFERENT (rolled) block per iteration, exact
        Gram accumulated alongside."""
        @jax.jit
        def run(sk, rw):
            def body(carry, i):
                s, gz = carry
                rows_i = jnp.roll(rw, i * 7, axis=1)
                s2, dlt = absorb(s, rows_i)
                rz = jax.lax.dot_general(
                    rows_i.astype(jnp.float32), z, (((1,), (0,)), ((), ())),
                    precision=HI)                     # (m, 64)
                gz = gz + jax.lax.dot_general(
                    rows_i.astype(jnp.float32), rz, (((0,), (0,)), ((), ())),
                    precision=HI)                     # (n, 64)
                return (s2, gz), dlt
            (s, gz), dl = jax.lax.scan(body, (sk, jnp.zeros((n, 64))),
                                       jnp.arange(REPS))
            return s, gz, jnp.sum(dl)

        out = run(sketch0, rows_bf)
        np.asarray(out[2])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(sketch0, rows_bf)
            np.asarray(out[2])
            best = min(best, time.perf_counter() - t0)
        return best / REPS, out

    # cost of the roll + exact-Gram accumulation alone (subtract it)
    def no_absorb(s, rows_i):
        return s, jnp.zeros((), s.dtype)

    t0_, _ = fold(no_absorb)
    print(f"roll+gram overhead:        {t0_ * 1e3:7.1f} ms/iter", flush=True)

    def report(tag, absorb):
        t, (s, gz, dl) = fold(absorb)
        bz = jnp.dot(s.T, jnp.dot(s, z, precision=HI), precision=HI)
        # sketch0 contributes to the sketch stream but not gz: add it
        g_full = gz + jnp.dot(sketch0.T, jnp.dot(sketch0, z, precision=HI),
                              precision=HI)
        err = float(jnp.max(jnp.abs(bz - g_full))) / \
            float(jnp.max(jnp.abs(g_full)))
        print(f"{tag}: {(t - t0_) * 1e3:7.1f} ms/absorb   true probe err: "
              f"{err:.3f}   loss {float(dl):.3e}", flush=True)

    report("A as-is, varying blocks   ",
           functools.partial(fd.shrink_rr_pair, ell=ell))
    report("B layout (r,d) HIGHEST    ",
           functools.partial(rr_pair_layout, ell=ell))
    report("C layout bf16 rows dots   ",
           functools.partial(rr_pair_layout, ell=ell,
                             rows_prec=jax.lax.Precision.DEFAULT))
    report("D layout HIGH rows dots   ",
           functools.partial(rr_pair_layout, ell=ell,
                             rows_prec=jax.lax.Precision.HIGH))


if __name__ == "__main__":
    main()
