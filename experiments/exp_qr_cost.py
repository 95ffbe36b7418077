"""Cost of jnp.linalg.qr((2112, 80)) inside the fold's power iteration vs
a CholeskyQR (all-MXU) replacement, at the BASELINE #3 absorb shape.

Run on the TPU host: python -u experiments/exp_qr_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mused_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

REPS = 16
m2, r = 64 + 2048, 80
rng = np.random.default_rng(0)
z = jnp.asarray(rng.normal(size=(m2, r)).astype(np.float32))
# make it ill-conditioned-ish like a power-iterated probe
z = z @ jnp.diag(jnp.logspace(0, -4, r).astype(np.float32))

print("backend:", jax.default_backend(), flush=True)


def timeit(label, fn):
    @jax.jit
    def loop(z):
        def body(i, acc):
            q = fn(z + acc * 1e-30)
            return acc + jnp.sum(q)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
    np.asarray(loop(z))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(z))
        best = min(best, (time.perf_counter() - t0) / REPS)
    q = fn(z)
    orth = float(jnp.linalg.norm(q.T @ q - jnp.eye(r)))
    print(f"{label:18s} {best*1e3:7.3f} ms  orth_err={orth:.2e}", flush=True)


timeit("qr", lambda z: jnp.linalg.qr(z)[0])


def cholqr(z):
    g = jnp.dot(z.T, z, precision=jax.lax.Precision.HIGHEST)
    g = g + (1e-12 * jnp.trace(g) / g.shape[0] + 1e-30) * jnp.eye(
        g.shape[0], dtype=g.dtype)
    c = jnp.linalg.cholesky(g)
    return jax.lax.linalg.triangular_solve(
        c, z.T, left_side=True, lower=True).T


timeit("cholqr", cholqr)


def cholqr2(z):          # repeated CholeskyQR: fixes the cond^2 orth loss
    return cholqr(cholqr(z))


timeit("cholqr2", cholqr2)
