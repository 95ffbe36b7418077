"""Sweep block size for the candidate-native fold (the round-3 block=4096
probe was measured FLAT on the DENSE fold, where block production scaled
with block size; the cand fold removed that, so per-absorb fixed costs —
QR ~2.5 ms, eigh, scan-step overhead — now dominate and bigger blocks
should amortize them).

Run on the TPU host: python -u experiments/exp_block_size.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mused_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

import jax

from mused_tpu.data.synthetic import synthetic_events_dataframe
from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.data import features as feat
from mused_tpu.ops import blocked_affinity as ba
from mused_tpu.utils.config import FeatureConfig

window, k_basis, ell = 98_304, 50, 64

print("backend:", jax.default_backend(), flush=True)
df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9,
                                seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
cols = ba.standard_columns(wf, fc)
jax.block_until_ready(cols.tensors)

for block in (2048, 4096, 8192):
    for nbins in (1536,):
        try:
            sk, sq, loss = ba.blocked_fd_sketch(
                cols, ell=ell, block=block, k_basis=k_basis,
                approx_knn=True, select="binned", nbins=nbins,
                mode="subspace", cand_fold=True)
            np.asarray(sk)
        except Exception as e:
            print(f"block={block} nbins={nbins}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sk, sq, loss = ba.blocked_fd_sketch(
                cols, ell=ell, block=block, k_basis=k_basis,
                approx_knn=True, select="binned", nbins=nbins,
                mode="subspace", cand_fold=True)
            np.asarray(sk)
            best = min(best, time.perf_counter() - t0)
        print(f"block={block} nbins={nbins}: {best:6.2f} s/window "
              f"({window / best / 1e3:6.1f}k rows/s/chip) "
              f"sq={float(sq):.0f} "
              f"loss_ratio={float(loss) / max(float(sq), 1):.3f}",
              flush=True)
