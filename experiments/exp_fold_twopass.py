"""Two-program fold: production and FD fold as SEPARATE jits.

Every within-one-jit restructure failed to recover the pure-sweep body
(grouped inner scan 2.9-3.0 s vs composed 2.83 s vs pure sweep 1.04 s;
barrier/cond/precision/layout all eliminated earlier).  The interference
is XLA scheduling/VMEM assignment across the composed loop body, so the
decisive variant is to deny the scheduler the composition entirely:

  jit P(gi)        -> (G*block, n) bf16 stacked fused blocks (pure-sweep
                      inner scan body, blocks written to an HBM output)
  jit F(state, b)  -> state after one shrink_rr_pair absorb of G*block rows

Host loop enqueues P(0), F, P(1), F, ... asynchronously (axon dispatch is
async; only the final np.asarray blocks), so device execution is
back-to-back.  If composed-fold overhead is scheduling interference, this
should land near  pure_sweep + 48 x 5ms  ~= 1.3 s.

Accuracy: same true-Gram probe as exp_fold_grouped.

Run on the TPU host: python experiments/exp_fold_twopass.py
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

    common = dict(approx=True, select="binned", nbins=nbins,
                  out_dtype=jnp.bfloat16)

    # exact Gram probe
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

    def timeit(fn, reps=2):
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best, out

    def report(tag, fn):
        t, out = timeit(fn)
        sk, sq, loss = out
        bz = jnp.dot(sk.T, jnp.dot(sk, z, precision=HI), precision=HI)
        err = float(jnp.max(jnp.abs(bz - gz))) / gs
        print(f"{tag}: {t:5.2f} s   probe err {err:.3f}   "
              f"loss {float(loss):.3e}", flush=True)

    report("composed as-is ", lambda: ba.blocked_fd_sketch(
        cols, ell=ell, block=block, k_basis=kb, approx_knn=True,
        select="binned", nbins=nbins, mode="subspace"))

    def make_two(group):
        @functools.partial(jax.jit, static_argnames=("kinds",))
        def produce(tensors, valids, idf, kinds, gi):
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

        def run():
            sketch = jnp.zeros((ell, n), jnp.float32)
            sq = jnp.zeros(())
            loss = jnp.zeros(())
            for gi in range(n // (block * group)):
                rows = produce(cols.tensors, cols.valids, cols.idf,
                               cols.kinds, jnp.int32(gi))
                sketch, sq, loss = absorb(sketch, sq, loss, rows)
            return sketch, sq, loss
        return run

    for g in (4, 8, 16):
        report(f"two-pass  G={g:2d} ", make_two(g))


if __name__ == "__main__":
    main()
