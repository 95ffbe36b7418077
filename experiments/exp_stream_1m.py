"""BASELINE config #3 as written: a 1M-row STREAM at 100k windows, e2e.

BENCH_DETAIL's config #3 measures ONE 98,304-row window's blocked FD
sketch (2.33 s device-side at last regen).  BASELINE.md:31 describes the
regime as a "1M-row stream, 100k window" — this probe runs that stream
through the REAL engine (process_streaming_data, SWFDMC, auto huge-window
blocked path): 10 tumbling 98,304-row windows = 983,040 rows end-to-end,
including host featurization, transfer, FD fold, query/reduce, clustering,
cross-window matching and metrics.

Reports wall seconds, rows/s (e2e, single chip + tunnel), and F1/NMI so
the number is a quality-checked throughput, not a kernel microbench.

Run on the TPU host: python experiments/exp_stream_1m.py [n_windows]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    window = 98_304
    total = n_windows * window

    import jax
    from mused_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    from mused_tpu import api

    t0 = time.perf_counter()
    df = synthetic_events_dataframe(n_rows=total + 64, n_events=24,
                                    noise_rate=0.9, seed=0)
    mods, mtypes, labels = prepare_modalities(
        df, subset_size=total, binary=True, sort_by_uploaded=False,
        noise_rate=0.9, seed=0)
    t_prep = time.perf_counter() - t0
    print(f"prep: {total} rows in {t_prep:.1f}s", flush=True)

    results, _ = api.get_initial_results()
    t0 = time.perf_counter()
    results = api.process_streaming_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        window_size=window, reduced_dim=50, k_basis=50, n_clusters_total=2,
        seed=0, approach="SWFDMC", complete_true_labels=labels,
        step_window_ratio=1, noise_rate=0.9, label_mode="binary",
        sorting=False, eps=1.5, min_samples=2)
    dt = time.perf_counter() - t0
    print(f"stream: {n_windows} x {window} rows in {dt:.1f}s "
          f"= {total / dt:.0f} rows/s e2e "
          f"({dt / n_windows:.2f} s/window)", flush=True)
    print(f"f1={results['f1_score'][0]:.4f} nmi={results['nmi_score'][0]:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
