"""Scoped-VMEM limit sweep for the composed huge-window fold.

exp_fold_grouped's trace evidence: inside the composed produce+absorb scan
body, the fold's VMEM residents (25 MB f32 sketch + 31 MB (n, r) y
intermediate, pinned by XLA memory-space assignment across the WHOLE body)
slow the production side's mid-size copies ~10-40x.  Every RESTRUCTURE
(grouped inner scan, two programs, stagger, unroll) failed to recover the
pure-sweep body — so instead steer the assignment directly: compile the
composed fold under different ``xla_tpu_scoped_vmem_limit_kib`` values via
per-compile compiler_options (XLA_FLAGS can't carry TPU flags through the
axon client — libtpu parses them remotely).

Run on the TPU host: python -u experiments/exp_fold_vmemflag.py
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from mused_tpu.utils.runtime import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    from mused_tpu.data import features as feat
    from mused_tpu.ops import blocked_affinity as ba
    from mused_tpu.ops.pallas import blocked_select as bsel
    from mused_tpu.utils.config import FeatureConfig
    from mused_tpu.ops import fd

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

    def impl(tensors, valids, idf):
        return ba._blocked_fd_impl(tensors, valids, idf, kinds=cols.kinds,
                                   ell=ell, block=block, k_basis=kb,
                                   mode="rr", approx_knn=True,
                                   select="binned", nbins=nbins)

    lowered = jax.jit(impl).lower(cols.tensors, cols.valids, cols.idf)

    for kib in (None, 4096, 8192, 16384, 32768, 65536, 98304):
        opts = ({} if kib is None
                else {"xla_tpu_scoped_vmem_limit_kib": str(kib)})
        tag = "default" if kib is None else f"{kib:>6}kib"
        try:
            c = lowered.compile(compiler_options=opts)
        except Exception as e:  # noqa: BLE001
            print(f"scoped_vmem={tag}: COMPILE FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)
            continue
        out = c(cols.tensors, cols.valids, cols.idf)
        np.asarray(out[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = c(cols.tensors, cols.valids, cols.idf)
            np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        print(f"scoped_vmem={tag}: {best:6.3f} s  "
              f"loss={float(out[2]):.1f}", flush=True)


if __name__ == "__main__":
    main()
