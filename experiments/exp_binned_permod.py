"""Round-4 probe (VERDICT r3 next #5): per-modality cost of the stride-
binned candidate sweep at the BASELINE #3 shape, across (tn, tm) tilings.

STATUS r3: the binned selection sweep is ~1.0 s of the ~1.9 s/100k window.
Roofline check per modality (v5e bf16 ~197 TFLOP/s):
  text  dot     2*2048*98304*4096 = 1.65 TF -> 8.4 ms/block ideal
  tags  jaccard 2*2048*98304*2048 = 0.83 TF -> 4.2 ms ideal
  loc   chord3  VPU broadcast (3 coords)    -> ~1 ms class
  time  l1      VPU broadcast (2 coords)    -> ~1 ms class
Where the measured ms/block sit against these says whether to chase MXU
scheduling (tilings) or kernel-count overhead (fusing loc+time).

Run on the TPU host: python -u experiments/exp_binned_permod.py
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

window, block, k_basis = 98_304, 2048, 50
REPS = 8

print("backend:", jax.default_backend(), flush=True)
df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9,
                                seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
# standard_columns builds the panels ON DEVICE from the small sparse token
# tensors — do NOT round-trip them through the host (1.2+ GB over the
# ~40 MB/s tunnel wedges for many minutes)
cols = ba.standard_columns(wf, fc)
jax.block_until_ready(cols.tensors)
nbins = bsel.default_nbins(window, k_max=3 * k_basis)
print(f"n={window} nbins={nbins} groups={window // nbins}", flush=True)

MODS = {}
for kind, t, valid in zip(cols.kinds, cols.tensors, cols.valids):
    row_sums = None
    if isinstance(t, tuple):
        t, row_sums = t
    if kind == "username":
        continue
    metric = {"location_xyz": "chord3", "time": "l1", "tags": "jaccard",
              "text_bf16": "dot"}[kind]
    MODS[kind] = (t, valid, row_sums, metric)
    print(f"{kind:14s} panel {t.shape} {t.dtype}", flush=True)


def timeit_mod(kind, tn, tm):
    t, valid, row_sums, metric = MODS[kind]

    @jax.jit
    def loop(t, valid, row_sums):
        def body(i, acc):
            start = i * block
            tr = jax.lax.dynamic_slice_in_dim(t, start, block, axis=0)
            vals, grp = bsel.binned_candidates_pallas(
                t, tr, valid, start, metric=metric, nbins=nbins,
                block=block, row_sums=row_sums, tn=tn, tm=tm)
            return acc + jnp.sum(vals > bsel.NEG / 2, dtype=jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    try:
        np.asarray(loop(t, valid, row_sums))
    except Exception as e:
        print(f"{kind:14s} tn={tn:5d} tm={tm:5d}  FAILED "
              f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        return None
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(loop(t, valid, row_sums))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{kind:14s} tn={tn:5d} tm={tm:5d} {best * 1e3:8.2f} ms/block "
          f"(x48 = {best * 48 * 1e3:6.0f} ms/window)", flush=True)
    return best


if __name__ == "__main__":
    base = {}
    for kind in MODS:
        base[kind] = timeit_mod(kind, tn=512, tm=2048)
    tot = sum(v for v in base.values() if v)
    print(f"== baseline total {tot * 1e3:.1f} ms/block "
          f"= {tot * 48:.2f} s/window (4 binned modalities)", flush=True)
    for tn in (256, 1024, 1536):
        for kind in MODS:
            timeit_mod(kind, tn=tn, tm=2048)
    for tm in (1024,):
        for kind in MODS:
            timeit_mod(kind, tn=512, tm=tm)
