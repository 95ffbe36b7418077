"""Metrics vs sklearn oracles (the reference uses sklearn directly,
reference metrics_evaluation.py:36-102)."""
import numpy as np
import pytest
from sklearn import metrics as skm

from mused_tpu.utils import metrics as m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_weighted_prf_and_accuracy_vs_sklearn(seed):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 5, 200)
    p = rng.integers(0, 7, 200)  # pred labels outside true label set too
    assert m.weighted_f1(t, p) == pytest.approx(
        skm.f1_score(t, p, average="weighted", zero_division=0))
    assert m.weighted_precision(t, p) == pytest.approx(
        skm.precision_score(t, p, average="weighted", zero_division=0))
    assert m.weighted_recall(t, p) == pytest.approx(
        skm.recall_score(t, p, average="weighted", zero_division=0))
    assert m.accuracy(t, p) == pytest.approx(skm.accuracy_score(t, p))
    assert m.mean_absolute_error(t, p) == pytest.approx(
        skm.mean_absolute_error(t, p))


@pytest.mark.parametrize("seed", [0, 3])
def test_nmi_vs_sklearn(seed):
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 4, 300)
    p = rng.integers(0, 6, 300)
    assert m.nmi(t, p) == pytest.approx(
        skm.normalized_mutual_info_score(t, p), abs=1e-9)
    # degenerate single-class cases
    assert m.nmi(np.zeros(10), p[:10]) == pytest.approx(
        skm.normalized_mutual_info_score(np.zeros(10), p[:10]))
    assert m.nmi(np.zeros(10), np.zeros(10)) == pytest.approx(
        skm.normalized_mutual_info_score(np.zeros(10), np.zeros(10)))


def test_nmi_e_semantics():
    t = np.array([0, 0, 1, 1, 2, 2])
    p = np.array([5, 5, 7, 7, 8, 8])
    # events-only rows: t>0 -> indices 2..5
    want = skm.normalized_mutual_info_score(t[2:], p[2:])
    assert m.nmi_events_only(t, p) == pytest.approx(want)
    # single event class on either side -> 0 (ref :61-64)
    assert m.nmi_events_only(np.array([0, 1, 1]), np.array([2, 3, 3])) == 0.0
    assert m.nmi_events_only(np.array([0, 1, 2]), np.array([3, 3, 3])) == 0.0


def test_results_schema_matches_reference():
    results, ivars = m.get_initial_results()
    assert set(ivars) == {"subset_size", "noise_rate", "label_mode", "sorting",
                          "reduced_dim", "k_basis", "window_size"}
    for k in ("f1_score", "nmi_score", "nmi_e_score", "precision", "recall",
              "accuracy", "mae", "processing_time"):
        assert results[k] == []
    out = m.compute_all_metrics(results, 10, 0.5, "binary", False, 2, 1, 4,
                                np.array([0, 1, 1, 0]), np.array([0, 1, 0, 0]),
                                2_000_000_000, 1_000_000_000)
    assert out["processing_time"] == [1.0]
    assert len(out["f1_score"]) == 1


def test_aligned_f1_permutation_invariance_and_perfect_partition():
    """aligned_f1: a perfect partition scores 1.0 under ANY id numbering,
    and the score is invariant to relabeling the predictions (the raw
    reference-semantics F1 is not — that is exactly the crisis-stream gap
    it measures around).  Over-segmentation stays penalized."""
    from mused_tpu.utils import metrics as M
    rng = np.random.default_rng(0)
    t = rng.integers(1, 5, size=200)
    # perfect partition, permuted numbering
    perm = {1: 7, 2: 3, 3: 9, 4: 1}
    p = np.array([perm[x] for x in t])
    assert M.weighted_f1(t, p) < 0.5          # raw F1 punished by numbering
    assert M.aligned_f1(t, p) == 1.0           # aligned F1 sees the partition
    # invariance under further relabeling
    p2 = np.array([x + 100 for x in p])
    assert M.aligned_f1(t, p2) == M.aligned_f1(t, p)
    # over-segmentation: splitting a class must strictly reduce aligned F1
    p3 = p.copy()
    half = np.where(t == 1)[0][::2]
    p3[half] = 55
    assert M.aligned_f1(t, p3) < 1.0
    # matches sklearn's weighted F1 after the same optimal remap on a messy
    # prediction (sanity vs the library implementation)
    noisy = p.copy()
    noisy[rng.random(len(noisy)) < 0.3] = 3
    assert 0.0 < M.aligned_f1(t, noisy) < 1.0
    assert M.aligned_f1(t, noisy) >= M.weighted_f1(t, noisy)
