"""Candidate-native huge-window fold vs the dense fold on the TPU.

The round-3 probe matrix (docs/fd_roofline.md) ended at: the composed
100k-window blocked FD sketch (~2.3-2.4 s) equals sweep (1.04 s) + fold
(~1.3 s), and the remaining cost is candidate -> DENSE block production
for the fold's three G-applications.  ops/pallas/cand_matvec removes that
production: the fold products run straight off the int8 candidate slabs.

This measures, at the BASELINE #3 shape (n=98,304, block=2048, ell=64,
k_basis=50):
  dense  — blocked_fd_sketch(..., cand_fold=False)  (round-3 production)
  cand   — blocked_fd_sketch(..., cand_fold=True)   (the new path)
plus each path's accounted shrink loss (the honest FD bound numerator) so
the speed comparison carries its accuracy alongside.

Run on the TPU host: python -u experiments/exp_cand_fold_tpu.py
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

from mused_tpu.data.synthetic import synthetic_events_dataframe
from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.data import features as feat
from mused_tpu.ops import blocked_affinity as ba
from mused_tpu.ops.pallas import blocked_select as bsel
from mused_tpu.utils.config import FeatureConfig

window, block, k_basis, ell = 98_304, 2048, 50, 64

print("backend:", jax.default_backend(), flush=True)
df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9,
                                seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
cols = ba.standard_columns(wf, fc)
cols = jax.tree.map(lambda x: jnp.asarray(np.asarray(x))
                    if hasattr(x, "shape") else x, cols)
nbins = bsel.default_nbins(window, k_max=3 * k_basis)
print(f"n={window} nbins={nbins} groups={window // nbins} "
      f"eligible={ba.cand_fold_supported(cols.kinds, cols.tensors, nbins, window)}",
      flush=True)


def measure(label, cand_fold):
    def run():
        sk, sq, loss = ba.blocked_fd_sketch(
            cols, ell=ell, block=block, k_basis=k_basis, mode="subspace",
            approx_knn=True, select="binned", nbins=nbins,
            cand_fold=cand_fold)
        return np.asarray(sk), float(sq), float(loss)

    t0 = time.perf_counter()
    sk, sq, loss = run()                       # compile + run
    print(f"{label:6s} first call {time.perf_counter() - t0:7.1f} s "
          f"(incl. compile)", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sk, sq, loss = run()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:6s} {best:6.2f} s/window  ({window / best / 1e3:6.1f}k "
          f"rows/s)  sq_fro={sq:.0f}  loss={loss:.1f}  "
          f"bound/ell={loss / ell:.2f}", flush=True)
    return best, sq, loss


d_t, d_sq, d_loss = measure("dense", False)
c_t, c_sq, c_loss = measure("cand", True)
print(f"\nspeedup {d_t / c_t:0.2f}x   edge-mass match: {d_sq == c_sq}   "
      f"loss ratio cand/dense: {c_loss / max(d_loss, 1e-9):0.3f}",
      flush=True)
