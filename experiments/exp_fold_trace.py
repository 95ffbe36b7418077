"""Profile the composed blocked FD fold (variant 4 of exp_fold_split) with
jax.profiler and rank device ops by total self-duration, to find where the
~0.7 s coexistence tax between block production and the rr fold goes.

Run on the TPU host: python experiments/exp_fold_trace.py
"""
import os
import sys
import glob
import time
import functools
from collections import defaultdict

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

    variant = sys.argv[1] if len(sys.argv) > 1 else "fold"

    @functools.partial(jax.jit, static_argnames=("kinds",))
    def go(tensors, valids, idf, kinds):
        c = ba.Columns(kinds=kinds, tensors=tensors, valids=valids, idf=idf)
        if variant == "fold":
            def f(state, fused, start):
                return fd.update_stream(state, fused, mode="rr")
            init = fd.init(ell, n)
        else:
            def f(acc, fused, start):
                return acc + jnp.sum(fused, dtype=jnp.float32)
            init = jnp.zeros((), jnp.float32)
        return ba._scan_blocks(c, block, kb, f, init,
                               approx=True, select="binned", nbins=nbins,
                               out_dtype=jnp.bfloat16)

    out = go(cols.tensors, cols.valids, cols.idf, cols.kinds)
    np.asarray(jax.tree_util.tree_leaves(out)[0])   # warm
    tdir = "/tmp/fold_trace_" + variant
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        t0 = time.perf_counter()
        out = go(cols.tensors, cols.valids, cols.idf, cols.kinds)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"traced run: {time.perf_counter() - t0:.2f} s", flush=True)

    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, flush=True)
    if not files:
        return
    from jax.profiler import ProfileData
    pd = ProfileData.from_file(files[0])
    for plane in pd.planes:
        total = defaultdict(float)
        count = defaultdict(int)
        tmin, tmax = float("inf"), 0.0
        for line in plane.lines:
            for ev in line.events:
                d = ev.duration_ns
                total[ev.name] += d
                count[ev.name] += 1
                tmin = min(tmin, ev.start_ns)
                tmax = max(tmax, ev.start_ns + d)
        if not total:
            continue
        print(f"\n=== plane {plane.name}: span "
              f"{(tmax - tmin) / 1e9 if count else 0:.2f} s, "
              f"{sum(count.values())} events", flush=True)
        for name, dur in sorted(total.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {dur / 1e6:9.1f} ms  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
