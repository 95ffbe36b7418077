"""Probe: which fixture/config makes the huge-window regime a real accuracy
oracle (VERDICT r3 next #1)?

BENCH_DETAIL 3b records NMI = 0.0 by construction: binary labels collapse 24
spatially-distinct planted events into ONE class, so per-window k=2 KMeans
splits arbitrarily; and the unsorted stream makes positional cross-window
matching random.  Hypothesis: the SAME generator with sorting=True (events
are time-localized -> contiguous runs) and label_mode="all" (per-window k =
active events + noise, the reference's labels quirk, main.py:41) yields high
NMI_e / f1_aligned — a number that would actually move if the blocked/
candidate-fold numerics broke.

Runs the REAL engine on CPU at window 8192 with force_blocked_window=True so
the huge-window blocked machinery (the path under test) executes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from mused_tpu import api
from mused_tpu.data.synthetic import synthetic_events_dataframe
from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.utils.config import PipelineConfig

WINDOW, N_WINDOWS = 8192, 4
TOTAL = WINDOW * N_WINDOWS


def run(label_mode, sorting, noise, n_events, force_blocked=True,
        cand_fold=None, fused_select=None):
    df = synthetic_events_dataframe(n_rows=2 * TOTAL, n_events=n_events,
                                    noise_rate=0.5, seed=0)
    mods, mtypes, labels = prepare_modalities(
        df, subset_size=TOTAL, binary=(label_mode == "binary"),
        event_types=(label_mode != "all"), sort_by_uploaded=sorting,
        noise_rate=noise, seed=0)
    nct = {"binary": 2, "types": 4, "all": 150}[label_mode]
    cfg = PipelineConfig(window_size=WINDOW, reduced_dim=50, k_basis=50,
                         approach="SWFDMC", label_mode=label_mode,
                         force_blocked_window=force_blocked,
                         **({} if cand_fold is None
                            else {"huge_window_cand_fold": cand_fold}),
                         **({} if fused_select is None
                            else {"huge_window_fused_select": fused_select}))
    r, _ = api.get_initial_results()
    t0 = time.perf_counter()
    r = api.process_streaming_data(
        results=r, data_modalities=mods, modality_types=mtypes,
        window_size=WINDOW, reduced_dim=50, k_basis=50, n_clusters_total=nct,
        seed=0, approach="SWFDMC", complete_true_labels=labels,
        step_window_ratio=1, noise_rate=noise, label_mode=label_mode,
        sorting=sorting, eps=1.5, min_samples=2, cfg=cfg)
    dt = time.perf_counter() - t0
    return {k: round(float(r[k][0]), 4) for k in
            ("nmi_score", "nmi_e_score", "f1_score", "f1_aligned")} | \
           {"wall_s": round(dt, 1)}


if __name__ == "__main__":
    cases = [
        ("sorted ALL n16",
         dict(label_mode="all", sorting=True, noise=0.9, n_events=16)),
        ("sorted ALL n24",
         dict(label_mode="all", sorting=True, noise=0.9, n_events=24)),
        ("sorted ALL n16 dense (non-blocked)",
         dict(label_mode="all", sorting=True, noise=0.9, n_events=16,
              force_blocked=False)),
        ("sorted ALL n16 cand-fold+binned ON",
         dict(label_mode="all", sorting=True, noise=0.9, n_events=16,
              cand_fold=True, fused_select=True)),
    ]
    for name, kw in cases:
        print(f"== {name}: {run(**kw)}", flush=True)
