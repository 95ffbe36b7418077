"""Locate the blocked-FD divergence on TPU: per-absorb sketch norms.

exp_fold_grouped found the PRODUCTION path (blocked_fd_sketch, rr mode,
binned select) returns a garbage sketch on the real chip (probe err
2.6e10, loss 9.7e18) while a grouped G=8 restructure is healthy
(err 0.10).  This probe scans the same blocks and records, after every
absorb: max|sketch|, delta, and the block's own max/sum (to rule out
production garbage).  Also reruns with eigh mode and with the strip
(non-binned) path for triangulation.

Run on the TPU host: python experiments/exp_fold_diverge.py [n]
"""
import os
import sys
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
    block, ell, kb = 2048, 64, 50
    df = synthetic_events_dataframe(n_rows=n + 64, n_events=6,
                                    noise_rate=0.9, seed=0)
    mods, _, _ = prepare_modalities(df, subset_size=n, binary=True,
                                    sort_by_uploaded=False, noise_rate=0.9,
                                    seed=0)
    fc = FeatureConfig()
    wf = feat.featurize_window(*mods, fc)
    cols = ba.standard_columns(wf, fc)
    nbins = bsel.default_nbins(n, k_max=150)

    def probe(select, mode, out_dtype):
        @functools.partial(jax.jit, static_argnames=("kinds",))
        def go(tensors, valids, idf, kinds):
            c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids,
                           idf=idf)
            def f(state, fused, start):
                st = fd.update_stream(state, fused, mode=mode)
                return st, (jnp.max(jnp.abs(st.sketch)),
                            st.shrink_loss,
                            jnp.max(fused.astype(jnp.float32)),
                            jnp.sum(fused.astype(jnp.float32)))
            def wrap(carry, fused, start):
                st, rec = f(carry[0], fused, start)
                recs = jax.tree_util.tree_map(
                    lambda a, v: a.at[carry[1]].set(v), carry[2], rec)
                return (st, carry[1] + 1, recs)
            nb = n // block
            init = (fd.init(ell, n), 0,
                    tuple(jnp.zeros((nb,), jnp.float32) for _ in range(4)))
            st, _, recs = ba._scan_blocks(
                c, block, kb, wrap, init, approx=True, select=select,
                nbins=nbins, out_dtype=out_dtype)
            return st.sketch, recs

        sk, recs = go(cols.tensors, cols.valids, cols.idf, cols.kinds)
        mx, loss, bmax, bsum = (np.asarray(r) for r in recs)
        print(f"\n== select={select} mode={mode} dtype={out_dtype.__name__}")
        print("  block max:", bmax.max(), " block edge counts:",
              bsum[:4].astype(int), "...", flush=True)
        for i in range(len(mx)):
            flag = " <-- " if mx[i] > 1e4 or not np.isfinite(mx[i]) else ""
            if i < 6 or flag or i % 8 == 0 or i == len(mx) - 1:
                print(f"  absorb {i:3d}: max|sketch| {mx[i]:12.4g}  "
                      f"loss {loss[i]:12.4g}{flag}", flush=True)
            if flag and i > 8:
                break

    probe("binned", "rr", jnp.bfloat16)
    probe("binned", "eigh", jnp.float32)
    probe("strip", "rr", jnp.bfloat16)


if __name__ == "__main__":
    main()
