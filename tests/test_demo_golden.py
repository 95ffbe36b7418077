"""Golden pin of the reference's demo smoke config (VERDICT r3 next #7).

The reference's commented-in demo experiment (reference main.py:279,
318-324: subset 100, window 8, noise 0.4, reduced_dim 2, k_basis 1, label
modes binary+types) is its only end-to-end smoke.  The CLI demo runs green
but nothing pinned its outputs — any engine/matching change could silently
shift demo behavior.  This test freezes the per-window MATCHED cluster
labels and the end metrics for every streaming approach at the demo scale
into tests/golden/demo_golden.json and fails on any drift.

Regenerate DELIBERATELY after an intended behavior change:

    python -m tests.test_demo_golden --regen

Determinism scope: CPU backend (conftest forces it), fixed seeds; KMeans /
randomized SVD are seeded so the demo point is bit-stable on one platform.
"""
import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "demo_golden.json")

# every approach the demo config can stream/batch deterministically on CPU
APPROACHES = ["SVDMC_batch", "SWFDMC", "sSVDMC", "sSVDMC_hung", "sSVDMC_pot",
              "sSVDMC_mini", "DBSCAN_batch", "HDBSCAN_batch", "DBSCAN_incr",
              "DBSCAN_centr"]
LABEL_MODES = ["binary", "types"]


def run_demo_point(approach: str, label_mode: str):
    """One demo sweep point (reference main.py:318-324 params), capturing
    the concatenated matched labels via a compute_all_metrics wrapper."""
    from mused_tpu import api
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.utils import metrics as our_metrics

    df = synthetic_events_dataframe(n_rows=400, n_events=6, noise_rate=0.5,
                                    seed=0)
    mods, mtypes, labels = api.prepare_modalities(
        df, subset_size=100, binary=(label_mode == "binary"),
        event_types=(label_mode != "all"), sort_by_uploaded=False,
        noise_rate=0.4, seed=0)
    noise = float(np.mean(np.asarray(labels) == 0))
    nct = 2 if label_mode == "binary" else 4

    captured = {}
    orig = our_metrics.compute_all_metrics

    def wrapper(results, subset_size, noise_rate, label_mode_, sorting,
                reduced_dim, k_basis, window_size, clusters, true_labels,
                end_time_ns, start_time_ns):
        captured["clusters"] = np.asarray(clusters)
        return orig(results, subset_size, noise_rate, label_mode_, sorting,
                    reduced_dim, k_basis, window_size, clusters, true_labels,
                    end_time_ns, start_time_ns)

    our_metrics.compute_all_metrics = wrapper
    try:
        results, _ = api.get_initial_results()
        kw = dict(results=results, data_modalities=mods,
                  modality_types=mtypes, reduced_dim=2, k_basis=1, seed=0,
                  approach=approach, complete_true_labels=labels,
                  noise_rate=noise, label_mode=label_mode, sorting=False,
                  eps=1.5, min_samples=2, window_size=8)
        if approach.endswith("_batch"):
            results = api.process_batch_data(n_clusters=nct,
                                             min_cluster_size=3, **kw)
        else:
            results = api.process_streaming_data(n_clusters_total=nct,
                                                 step_window_ratio=1, **kw)
    finally:
        our_metrics.compute_all_metrics = orig

    metrics = {k: float(results[k][0]) for k in
               ("f1_score", "nmi_score", "nmi_e_score", "precision",
                "recall", "accuracy", "mae", "f1_aligned")
               if k in results and results[k]}
    return {"matched_labels": captured["clusters"].astype(int).tolist(),
            "metrics": metrics}


def _golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.fail("tests/golden/demo_golden.json missing — run "
                    "`python -m tests.test_demo_golden --regen`")
    return _golden()


@pytest.mark.parametrize("label_mode", LABEL_MODES)
@pytest.mark.parametrize("approach", APPROACHES)
def test_demo_golden(golden, approach, label_mode, capsys):
    got = run_demo_point(approach, label_mode)
    capsys.readouterr()          # demo subset < 500 triggers debug oracles
    want = golden[f"{approach}:{label_mode}"]
    assert got["matched_labels"] == want["matched_labels"], \
        f"{approach}/{label_mode}: matched labels drifted"
    for k, v in want["metrics"].items():
        assert got["metrics"][k] == pytest.approx(v, abs=1e-9), \
            f"{approach}/{label_mode}: metric {k} drifted"


def _regen():
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    out = {}
    for approach in APPROACHES:
        for label_mode in LABEL_MODES:
            out[f"{approach}:{label_mode}"] = run_demo_point(approach,
                                                             label_mode)
            print(f"captured {approach}:{label_mode}")
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        _regen()
    else:
        print(__doc__)
