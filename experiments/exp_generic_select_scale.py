"""Production-scale strip-vs-binned routing probe for generic kinds.

exp_generic_split_tpu.py measured binned at 0.70x strip for
embedding+default at n=16384 — but the production huge-window regime is
n~100k where the strip path must materialize a (block, n) f32 sim strip
and top_k over n.  This probe measures per-block wall time of the fused
rowblock at n=98304 / block=2048 / nbins=default_nbins(n) for:

  1. embedding(384)+default(128) columns (the generic stream shape),
  2. each generic kind alone,
  3. the standard 5-modality columns (sanity: binned should win there).

Decides whether fused-select should route generic kinds per-kind instead
of globally.  Run on the TPU host: python experiments/exp_generic_select_scale.py

RESULT (v5e, 2026-08-18): binned wins decisively at production scale —
emb+dflt strip 25.2 -> binned 8.1 ms/block (3.09x), embedding alone
2.46x, default alone 2.30x.  The n=16384 strip win in
exp_generic_split_tpu was a small-n artifact, and at that size the
engine uses the dense path anyway (huge-window threshold 32k): the
global auto-ON routing stands, no per-kind override needed.  The
standard5 strip leg of this probe died on the known HTTP 413
closed-over-constants trap (time_sweep closes cols into the jit) —
standard5 strip-vs-binned was already measured in the sixth session
(4.42 -> ~2.9 s/window).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.utils.runtime import enable_compilation_cache


def time_sweep(cols, select, nbins, block=2048, k_basis=50, nblocks=8):
    """Mean per-block wall of fused_rowblock over nblocks blocks."""
    from mused_tpu.ops import blocked_affinity as ba
    import functools

    @functools.partial(jax.jit, static_argnames=("select", "nbins"))
    def sweep(start0, select, nbins):
        def body(i, acc):
            blk = ba.fused_rowblock(cols, start0 + i * block, block,
                                    k_basis, approx=True, select=select,
                                    nbins=nbins)
            return acc + jnp.sum(blk)
        return jax.lax.fori_loop(0, nblocks, body, 0.0)

    np.asarray(sweep(0, select, nbins))   # compile + warm
    t0 = time.perf_counter()
    out = sweep(0, select, nbins)
    np.asarray(out)
    return (time.perf_counter() - t0) / nblocks * 1e3   # ms/block


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())
    from mused_tpu.ops import blocked_affinity as ba
    from mused_tpu.ops.pallas import blocked_select as bsel
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    from mused_tpu.data import features as feat
    from mused_tpu.utils.config import FeatureConfig

    n = 98_304
    nbins = bsel.default_nbins(n, k_max=150)
    print(f"n={n} nbins={nbins}")
    rng = np.random.default_rng(7)

    emb = rng.standard_normal((n, 384)).astype(np.float32)
    emb[rng.random(n) < 0.02] = np.nan
    dflt = (rng.standard_normal((n, 128)) * 3).astype(np.float32)
    dflt[rng.random(n) < 0.02] = np.nan

    for label, mats, types in [
        ("emb+dflt", [emb, dflt], ("embedding", "default")),
        ("embedding", [emb], ("embedding",)),
        ("default", [dflt], ("default",)),
    ]:
        cols = ba.generic_columns(mats, types)
        ms_strip = time_sweep(cols, "strip", 0)
        ms_binned = time_sweep(cols, "binned", nbins)
        print(f"{label:10s}: strip {ms_strip:7.1f} ms/block  "
              f"binned {ms_binned:7.1f} ms/block  "
              f"(binned {ms_strip / ms_binned:.2f}x)")

    # standard 5-modality sanity at the same n
    df = synthetic_events_dataframe(n_rows=n + 64, n_events=6,
                                    noise_rate=0.9, seed=0)
    mods, _, _ = prepare_modalities(df, subset_size=n, binary=True,
                                    sort_by_uploaded=False, noise_rate=0.9,
                                    seed=0)
    fc = FeatureConfig()
    wf = feat.featurize_window(*mods, fc)
    cols = ba.standard_columns(wf, fc)
    ms_strip = time_sweep(cols, "strip", 0)
    ms_binned = time_sweep(cols, "binned", nbins)
    print(f"{'standard5':10s}: strip {ms_strip:7.1f} ms/block  "
          f"binned {ms_binned:7.1f} ms/block  "
          f"(binned {ms_strip / ms_binned:.2f}x)")


if __name__ == "__main__":
    main()
