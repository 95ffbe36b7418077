"""Golden parity: run the ACTUAL reference pipeline head-to-head against ours.

The reference at /root/reference can execute its sklearn-only approaches once
its unavailable imports (swfd submodule, incdbscan, hdbscan, ot) are stubbed.
We feed both pipelines the same synthetic SED-like modalities and require the
event-detection metrics to agree within tolerance (SURVEY.md §7.3: parity is
at the metric level; KMeans seeds and randomized SVD differ by design).

This is a comparison harness, not a port: the reference is imported from its
own tree at test time, never vendored.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE_DIR = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def reference_modules():
    """Import the reference's engine with its missing deps stubbed."""
    stubs = {}
    for name in ("swfd", "incdbscan", "hdbscan", "ot"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "swfd":
                mod.SeqBasedSWFD = None          # only SWFDMC needs it
            if name == "incdbscan":
                mod.IncrementalDBSCAN = None
            if name == "hdbscan":
                mod.HDBSCAN = None
            if name == "ot":
                mod.sinkhorn = None
            sys.modules[name] = mod
            stubs[name] = mod
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import main as ref_main                  # noqa: F401
        import metrics_evaluation as ref_metrics
        yield ref_main, ref_metrics
    finally:
        sys.path.remove(REFERENCE_DIR)
        for name in stubs:
            del sys.modules[name]
        for name in ("main", "matrix_operations", "metrics_evaluation",
                     "data_loader", "output_generation", "tee"):
            sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def shared_stream():
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    df = synthetic_events_dataframe(n_rows=420, n_events=4, noise_rate=0.5,
                                    seed=0)
    return prepare_modalities(df, subset_size=256, sort_by_uploaded=True,
                              binary=True, noise_rate=0.5, seed=0)


def run_reference(ref, stream, approach):
    ref_main, ref_metrics = ref
    mods, mtypes, labels = stream
    results, _ = ref_metrics.get_initial_results()
    return ref_main.process_streaming_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        window_size=64, reduced_dim=8, k_basis=3, n_clusters_total=2,
        seed=0, approach=approach, complete_true_labels=labels,
        step_window_ratio=1, noise_rate=0.5, label_mode="binary",
        sorting=True, eps=1.5, min_samples=2)


def run_ours(stream, approach):
    from mused_tpu import api
    mods, mtypes, labels = stream
    results, _ = api.get_initial_results()
    return api.process_streaming_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        window_size=64, reduced_dim=8, k_basis=3, n_clusters_total=2,
        seed=0, approach=approach, complete_true_labels=labels,
        step_window_ratio=1, noise_rate=0.5, label_mode="binary",
        sorting=True, eps=1.5, min_samples=2)


@pytest.mark.parametrize("approach", ["sSVDMC", "sSVDMC_mini"])
def test_metric_parity_streaming(reference_modules, shared_stream, approach,
                                 capsys):
    theirs = run_reference(reference_modules, shared_stream, approach)
    ours = run_ours(shared_stream, approach)
    capsys.readouterr()          # swallow the reference's debug prints
    # Parity-or-better on the permutation-INVARIANT metric: raw F1/accuracy
    # on cluster ids is seed luck (which cluster drew id 0) in both pipelines
    # — observed: reference NMI 0.03 with F1 0.59 (uninformative clusters,
    # lucky ids) vs ours NMI 0.25 with F1 0.22 (better clusters, unlucky ids).
    a, b = theirs["nmi_score"][0], ours["nmi_score"][0]
    assert b >= a - 0.1, f"{approach} nmi: ref={a:.3f} ours={b:.3f}"


def test_batch_parity(reference_modules, shared_stream, capsys):
    ref_main, ref_metrics = reference_modules
    from mused_tpu import api
    mods, mtypes, labels = shared_stream
    results, _ = ref_metrics.get_initial_results()
    theirs = ref_main.process_batch_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        reduced_dim=8, k_basis=3, n_clusters=2, seed=0,
        approach="SVDMC_batch", complete_true_labels=labels, noise_rate=0.5,
        label_mode="binary", sorting=True, eps=1.5, min_samples=2,
        min_cluster_size=3, window_size=64)
    results, _ = api.get_initial_results()
    ours = api.process_batch_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        reduced_dim=8, k_basis=3, n_clusters=2, seed=0,
        approach="SVDMC_batch", complete_true_labels=labels, noise_rate=0.5,
        label_mode="binary", sorting=True, eps=1.5, min_samples=2,
        min_cluster_size=3, window_size=64)
    capsys.readouterr()
    assert abs(theirs["nmi_score"][0] - ours["nmi_score"][0]) <= 0.15


def test_dbscan_centroid_matching_parity(reference_modules, capsys, rng):
    """Our centroid-matched incremental DBSCAN behaves like the reference's
    perform_dbscan_incr_clustering across two windows of drifting blobs."""
    import matrix_operations as ref_ops
    from mused_tpu.ops import dbscan as ours
    base = rng.normal(size=(2, 6)) * 8
    w1 = np.concatenate([base[0] + rng.normal(size=(25, 6)) * 0.05,
                         base[1] + rng.normal(size=(25, 6)) * 0.05]).astype(np.float32)
    w2 = np.concatenate([base[1] + rng.normal(size=(25, 6)) * 0.05,
                         base[0] + rng.normal(size=(25, 6)) * 0.05]).astype(np.float32)

    rl1, rc1, ru1 = ref_ops.perform_dbscan_incr_clustering(w1, None, None,
                                                           eps=1.0, min_samples=3)
    rl2, _, _ = ref_ops.perform_dbscan_incr_clustering(w2, rc1, ru1,
                                                       eps=1.0, min_samples=3)
    ol1, oc1, ou1 = ours.dbscan_centroid_incremental(w1, None, None,
                                                     eps=1.0, min_samples=3)
    ol2, _, _ = ours.dbscan_centroid_incremental(w2, oc1, ou1,
                                                 eps=1.0, min_samples=3)
    capsys.readouterr()
    np.testing.assert_array_equal(rl1, ol1)
    np.testing.assert_array_equal(rl2, ol2)
