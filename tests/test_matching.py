"""Cluster matching vs scipy/POT-oracle behavior (reference matrix_operations.py:155-233)."""
import numpy as np
import pytest

from mused_tpu.ops import matching


def test_cost_matrix_and_feasibility():
    prev = np.array([0, 0, 0, 1, 1, 1, 2])
    new = np.array([5, 5, 5, 6, 6, 6, 7])
    cost, up, un = matching.overlap_cost_matrix(prev, new, min_overlap=3)
    assert list(up) == [0, 1, 2]
    assert list(un) == [5, 6, 7]
    assert cost[0, 0] == -3 and cost[1, 1] == -3
    assert np.isinf(cost[2, 2])  # overlap 1 < min_overlap
    assert not matching.is_feasible(np.full((2, 2), np.inf))
    assert not matching.is_feasible(cost)  # row 2 all-inf (ref :229)


def test_hungarian_remaps_labels():
    prev = np.array([0] * 5 + [1] * 5)
    new = np.array([7] * 5 + [9] * 5)
    out = matching.match_clusters(prev, new, method="hungarian", min_overlap=3)
    np.testing.assert_array_equal(out, prev)


def test_hungarian_crossed_overlap():
    prev = np.array([0] * 4 + [1] * 6)
    new = np.array([9] * 6 + [7] * 4)  # new 9 overlaps prev0(4)+prev1(2); new 7 overlaps prev1(4)
    out = matching.match_clusters(prev, new, method="hungarian", min_overlap=3)
    # optimal: 9->0 (4) and 7->1 (4)
    np.testing.assert_array_equal(out, np.array([0] * 6 + [1] * 4))


def test_first_window_passthrough():
    new = np.array([1, 2, 3])
    assert matching.match_clusters(None, new) is new
    assert matching.match_clusters(np.array([]), new) is new


def test_infeasible_returns_unmatched():
    prev = np.array([0, 1, 2])
    new = np.array([5, 6, 7])  # all overlaps 1 < min_overlap 3
    out = matching.match_clusters(prev, new, min_overlap=3)
    np.testing.assert_array_equal(out, new)


def test_all_inf_column_is_infeasible_quirk():
    """A new cluster with no >=min_overlap counterpart makes the whole match
    infeasible in the reference (all-inf column screen, ref :230-232) — even
    though a partial assignment exists.  Quirk preserved."""
    prev = np.array([0] * 5 + [1] * 5)
    new = np.array([7] * 5 + [8] * 3 + [9] * 2)
    out = matching.match_clusters(prev, new, method="hungarian", min_overlap=3)
    np.testing.assert_array_equal(out, new)


def test_unmatched_new_labels_keep_identity():
    """With equal cluster counts but an extra sub-threshold pairing, matched
    ids remap and the assignment keeps mapping.get(c, c) semantics (ref :221)."""
    prev = np.array([0] * 5 + [1] * 5)
    new = np.array([7] * 5 + [8] * 5)
    out = matching.match_clusters(prev, new, method="hungarian", min_overlap=3)
    assert list(out[:5]) == [0] * 5
    assert list(out[5:]) == [1] * 5


def test_sinkhorn_matches_pot_plan():
    """Our jitted Sinkhorn vs the POT library if available, else the analytic
    doubly-stochastic property."""
    rng = np.random.default_rng(0)
    cost = rng.random((4, 5))
    a = np.ones(4) / 4
    b = np.ones(5) / 5
    plan = np.asarray(matching.sinkhorn(a, b, cost, reg=0.1, n_iters=500))
    np.testing.assert_allclose(plan.sum(axis=1), a, atol=1e-4)
    np.testing.assert_allclose(plan.sum(axis=0), b, atol=1e-4)
    try:
        import ot  # POT, used by the reference (matrix_operations.py:198)
    except ImportError:
        return
    want = ot.sinkhorn(a, b, cost, reg=0.1)
    np.testing.assert_allclose(plan, want, atol=1e-4)


def test_pot_matching_end_to_end():
    prev = np.array([0] * 10 + [1] * 10)
    new = np.array([5] * 10 + [6] * 10)
    out = matching.match_clusters(prev, new, method="pot", min_overlap=3)
    np.testing.assert_array_equal(out, prev)


def test_invalid_method_raises():
    with pytest.raises(ValueError):
        matching.match_clusters(np.array([0, 0, 0]), np.array([1, 1, 1]),
                                method="nope", min_overlap=1)


# ---------------------------------------------------------------------------
# CentroidMatcher: stable IDs in input feature space (framework extension)
# ---------------------------------------------------------------------------

def test_centroid_matcher_stable_ids_across_permuted_windows():
    """Two windows with identical cluster geometry but permuted local labels
    and shuffled row order map to the SAME global IDs."""
    rng = np.random.default_rng(0)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    m = matching.CentroidMatcher()

    pts1 = np.concatenate([c + rng.normal(size=(20, 2)) * 0.1 for c in centers])
    lab1 = np.repeat([0, 1, 2], 20)
    out1 = m.match(pts1, lab1)
    np.testing.assert_array_equal(out1, lab1)   # first window keeps its ids

    perm = rng.permutation(60)
    pts2 = np.concatenate([c + rng.normal(size=(20, 2)) * 0.1 for c in centers])[perm]
    lab2 = np.repeat([2, 0, 1], 20)[perm]       # permuted local labels
    out2 = m.match(pts2, lab2)
    want = np.repeat([0, 1, 2], 20)[perm]       # global ids follow geometry
    np.testing.assert_array_equal(out2, want)


def test_centroid_matcher_fresh_ids_for_new_clusters():
    m = matching.CentroidMatcher(max_dist=1.0)
    pts1 = np.array([[0.0, 0.0]] * 5 + [[10.0, 0.0]] * 5)
    out1 = m.match(pts1, np.repeat([0, 1], 5))
    np.testing.assert_array_equal(out1, np.repeat([0, 1], 5))
    # second window: cluster near (0,0) persists, a far-away cluster appears
    pts2 = np.array([[0.1, 0.0]] * 5 + [[50.0, 50.0]] * 5)
    out2 = m.match(pts2, np.repeat([7, 3], 5))
    assert list(np.unique(out2[:5])) == [0]      # matched to registry id 0
    assert out2[5] not in (0, 1)                 # fresh globally-unique id
    assert len(np.unique(out2)) == 2


def test_centroid_matcher_snapshot_roundtrip():
    m = matching.CentroidMatcher(max_dist=2.5)
    pts = np.array([[0.0, 0.0]] * 4 + [[5.0, 5.0]] * 4)
    m.match(pts, np.repeat([0, 1], 4))
    m2 = matching.CentroidMatcher.from_snapshot(m.snapshot())
    out = m2.match(pts + 0.01, np.repeat([1, 0], 4))
    np.testing.assert_array_equal(out, np.repeat([0, 1], 4))
    assert m2.max_dist == 2.5


def test_centroid_matching_recovers_global_nmi_on_unsorted_stream():
    """BASELINE.md #2 regime: per-window clustering is good but the stream is
    temporally unsorted, so positional-overlap matching randomizes global IDs;
    centroid matching must recover global NMI close to per-window NMI."""
    from mused_tpu import api
    from mused_tpu.data.synthetic import crisis_embedding_stream
    from mused_tpu.utils.config import PipelineConfig

    window, subset = 128, 768
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=subset, n_events=4, noise_rate=0.25, d_text=64, d_image=64,
        seed=0)
    scores = {}
    for match in ("auto", "centroid"):
        cfg = PipelineConfig(window_size=window, reduced_dim=32, k_basis=6,
                             approach="sSpectral", label_mode="all",
                             n_clusters_override=5, eps=1.5, min_samples=2,
                             matching=match)
        r, _ = api.get_initial_results()
        r = api.process_streaming_data(
            results=r, data_modalities=mods, modality_types=mtypes,
            window_size=window, reduced_dim=32, k_basis=6, n_clusters_total=5,
            seed=0, approach="sSpectral", complete_true_labels=labels,
            step_window_ratio=1, noise_rate=0.25, label_mode="all",
            sorting=False, eps=1.5, min_samples=2, cfg=cfg)
        scores[match] = r["nmi_score"][0]
    assert scores["centroid"] > 0.7
    assert scores["centroid"] > scores["auto"] + 0.2


@pytest.mark.slow
def test_centroid_matching_batched_dispatch_matches_sequential():
    """matching='centroid' + windows_per_batch>1: the scanned dispatch feeds
    the centroid registry from host modality slices — results must equal the
    per-window path exactly."""
    from mused_tpu import api
    from mused_tpu.data.synthetic import crisis_embedding_stream
    from mused_tpu.utils.config import PipelineConfig

    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=640, n_events=3, noise_rate=0.25, d_text=48, d_image=48,
        seed=1)
    out = {}
    for w in (1, 3):
        cfg = PipelineConfig(window_size=128, reduced_dim=32, k_basis=6,
                             approach="sSpectral", label_mode="all",
                             n_clusters_override=4, matching="centroid",
                             windows_per_batch=w)
        r, _ = api.get_initial_results()
        r = api.process_streaming_data(
            results=r, data_modalities=mods, modality_types=mtypes,
            window_size=128, reduced_dim=32, k_basis=6, n_clusters_total=4,
            seed=0, approach="sSpectral", complete_true_labels=labels,
            step_window_ratio=1, noise_rate=0.25, label_mode="all",
            sorting=False, eps=1.5, min_samples=2, cfg=cfg)
        out[w] = (r["nmi_score"][0], r["f1_score"][0])
    assert out[3] == pytest.approx(out[1], abs=1e-9)


def test_centroid_matcher_tolerates_nonfinite_rows():
    """Rows with non-finite features (the engine's invalid-row convention,
    e.g. NaN padding) are excluded from centroid estimation instead of
    poisoning the mean / crashing the Hungarian solver."""
    m = matching.CentroidMatcher()
    pts1 = np.array([[0.0, 0.0]] * 5 + [[10.0, 0.0]] * 5)
    m.match(pts1, np.repeat([0, 1], 5))
    pts2 = np.array([[0.1, 0.0]] * 4 + [[np.nan, np.inf]]
                    + [[10.1, 0.0]] * 5)
    out = m.match(pts2, np.repeat([1, 0], 5))     # NaN row rides cluster 1
    np.testing.assert_array_equal(out, np.repeat([0, 1], 5))


def test_centroid_matcher_registry_eviction():
    """The registry stays bounded: least-recently-matched clusters evict
    beyond max_registry, and retired IDs are never reused."""
    m = matching.CentroidMatcher(max_dist=0.5, max_registry=4)
    seen_ids = set()
    for w in range(8):
        # every window presents two brand-new far-apart clusters
        base = 100.0 * (w + 1)
        pts = np.array([[base, 0.0]] * 3 + [[0.0, base]] * 3)
        out = m.match(pts, np.repeat([0, 1], 3))
        assert len(m.ids) <= 4
        ids = set(np.unique(out).tolist())
        assert not (ids & seen_ids), "retired IDs must not be reused"
        seen_ids |= ids
