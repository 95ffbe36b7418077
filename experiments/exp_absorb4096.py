"""Selection at block=2048 (the proven tiling) + FD absorb at 4096 (two
sub-blocks per shrink): halves the per-absorb fixed costs (QR ~2.5 ms,
eigh, scan step) without touching the text-kernel tiling the remote
compiler rejects at tm rows > 2048.

Run on the TPU host: python -u experiments/exp_absorb4096.py
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mused_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from mused_tpu.data.synthetic import synthetic_events_dataframe
from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.data import features as feat
from mused_tpu.ops import blocked_affinity as ba, fd
from mused_tpu.ops.pallas import blocked_select as bsel, cand_matvec as cm
from mused_tpu.utils.config import FeatureConfig

window, k_basis, ell = 98_304, 50, 64
sel_block = 2048

print("backend:", jax.default_backend(), flush=True)
df = synthetic_events_dataframe(n_rows=window + 64, n_events=6,
                                noise_rate=0.9, seed=0)
mods, _, _ = prepare_modalities(df, subset_size=window, binary=True,
                                sort_by_uploaded=False, noise_rate=0.9,
                                seed=0)
fc = FeatureConfig()
wf = feat.featurize_window(*mods, fc)
cols = ba.standard_columns(wf, fc)
nbins = bsel.default_nbins(window, k_max=3 * k_basis)
jax.block_until_ready(cols.tensors)


@functools.partial(jax.jit, static_argnames=("kinds", "absorb"))
def fold(tensors, valids, idf, kinds, absorb):
    c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
    sub = absorb // sel_block

    def body(st, i):
        cands = [ba.candidate_rowblock(c, i * absorb + s * sel_block,
                                       sel_block, k_basis, nbins, 512, True)
                 for s in range(sub)]
        cand = cm.CandBlock(
            slabs=jnp.concatenate([cb.slabs for cb in cands], axis=1),
            uid_rows=jnp.concatenate([cb.uid_rows for cb in cands], axis=0),
            uid_cols=cands[0].uid_cols,
            start=cands[0].start)
        b, delta, edges = fd.shrink_rr_cands(st.sketch, cand, ell)
        return fd.FDState(sketch=b, sq_frobenius=st.sq_frobenius + edges,
                          shrink_loss=st.shrink_loss + delta,
                          count=st.count + jnp.int32(absorb)), None

    state, _ = jax.lax.scan(body, fd.init(ell, c.n),
                            jnp.arange(c.n // absorb))
    return state.sketch, state.sq_frobenius, state.shrink_loss


for absorb in (2048, 4096, 8192):
    try:
        sk, sq, loss = fold(cols.tensors, cols.valids, cols.idf, cols.kinds,
                            absorb)
        np.asarray(sk)
    except Exception as e:
        print(f"absorb={absorb}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        continue
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sk, sq, loss = fold(cols.tensors, cols.valids, cols.idf, cols.kinds,
                            absorb)
        np.asarray(sk)
        best = min(best, time.perf_counter() - t0)
    print(f"absorb={absorb}: {best:6.2f} s/window "
          f"({window / best / 1e3:6.1f}k rows/s/chip) sq={float(sq):.0f} "
          f"loss_ratio={float(loss) / max(float(sq), 1):.3f}", flush=True)
