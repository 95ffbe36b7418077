"""Profile the 100k-window blocked FD sketch: sweep vs fold split.

BENCH_DETAIL config #3 measures blocked_fd_sketch end-to-end (4.38 s at
n=98304 after the sixth-session kernel work); the pure adjacency sweep
measured ~2.9 s, implying ~1.5 s in the FD fold (fd.shrink_rr absorbs +
carry).  This probe separates them on the real chip:

  1. pure sweep: _scan_blocks summing each fused block (no fold state),
  2. full blocked_fd_sketch (mode=rr, the default resolution of subspace),
  3. full blocked_fd_sketch with mode=eigh (comparison),
  4. fold-only estimate: (2) - (1).

Run on the TPU host: python experiments/exp_fold_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.utils.runtime import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    from mused_tpu.data import features as feat
    from mused_tpu.ops import blocked_affinity as ba
    from mused_tpu.ops.pallas import blocked_select as bsel
    from mused_tpu.utils.config import FeatureConfig
    import functools

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
    print(f"n={n} nbins={nbins}")

    def timeit(fn, reps=2):
        np.asarray(jax.tree_util.tree_leaves(fn())[0])  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    # pass tensors as ARGS (closing them into the jit trips the tunnel's
    # HTTP 413 request-size limit on the big text panels)
    @functools.partial(jax.jit, static_argnames=("kinds",))
    def pure_sweep(tensors, valids, idf, kinds):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        def f(acc, fused, start):
            return acc + jnp.sum(fused, dtype=jnp.float32)
        return ba._scan_blocks(c, block, kb, f, jnp.zeros((), jnp.float32),
                               approx=True, select="binned", nbins=nbins,
                               out_dtype=jnp.bfloat16)

    t_sweep = timeit(lambda: pure_sweep(cols.tensors, cols.valids, cols.idf,
                                        cols.kinds))
    print(f"pure sweep (bf16 blocks): {t_sweep:.2f} s", flush=True)

    t_rr = timeit(lambda: ba.blocked_fd_sketch(
        cols, ell=ell, block=block, k_basis=kb, approx_knn=True,
        select="binned", nbins=nbins, mode="subspace"))
    print(f"blocked_fd_sketch rr:     {t_rr:.2f} s  (fold ≈ {t_rr - t_sweep:.2f} s)",
          flush=True)

    t_eigh = timeit(lambda: ba.blocked_fd_sketch(
        cols, ell=ell, block=block, k_basis=kb, approx_knn=True,
        select="binned", nbins=nbins, mode="eigh"))
    print(f"blocked_fd_sketch eigh:   {t_eigh:.2f} s  (fold ≈ {t_eigh - t_sweep:.2f} s)",
          flush=True)


if __name__ == "__main__":
    main()
