"""Phase profile of the huge-window e2e stream (config 3b gap analysis).

BENCH_DETAIL 3b: 5.09 s/window e2e vs 2.39 s reduction-only — where do the
other ~2.7 s go?  Times each phase serially (featurize, device step incl.
internal pulls, matching) for 4 windows at the 3b shapes.

Run on the TPU host: python -u experiments/exp_1m_phases.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mused_tpu.utils.runtime import enable_compilation_cache


def main():
    enable_compilation_cache()
    import jax
    print("backend:", jax.default_backend(), flush=True)
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    from mused_tpu.engine.streaming import StreamingEngine
    from mused_tpu.utils.config import PipelineConfig

    window, n_windows = 98_304, 4
    total = window * n_windows
    df = synthetic_events_dataframe(n_rows=total + 64, n_events=24,
                                    noise_rate=0.9, seed=0)
    t0 = time.perf_counter()
    mods, mtypes, labels = prepare_modalities(
        df, subset_size=total, binary=True, sort_by_uploaded=False,
        noise_rate=0.9, seed=0)
    print(f"prepare_modalities: {time.perf_counter() - t0:.2f}s", flush=True)

    cfg = PipelineConfig(window_size=window, reduced_dim=50, k_basis=50,
                         approach="SWFDMC", label_mode="binary",
                         n_clusters_override=2)
    eng = StreamingEngine(cfg)
    prev = None
    for w in range(n_windows):
        lo = w * window
        wm = [m[lo:lo + window] for m in mods]
        wl = labels[lo:lo + window]
        t0 = time.perf_counter()
        feats = eng.featurize(wm, mtypes)
        t1 = time.perf_counter()
        pending = eng.dispatch_window(wm, mtypes, wl, w, prev, features=feats)
        t2 = time.perf_counter()
        prev = eng.finalize_window(pending, prev)
        t3 = time.perf_counter()
        print(f"w{w}: featurize {t1-t0:5.2f}s  dispatch(large path, incl "
              f"matching) {t2-t1:5.2f}s  finalize {t3-t2:5.2f}s", flush=True)
    for name, st in eng.timer.summary().items():
        print(f"  span {name}: {st}", flush=True)


if __name__ == "__main__":
    main()
