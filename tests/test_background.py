"""Label-free background bucket (PipelineConfig.background_bucket).

No reference analog — the reference forces every row into a cluster.  The
bucket re-labels rows in the far mode of the embedding distance-to-centroid
distribution -1 (ops/kmeans.mark_background), validated on the crisis
stream family where ground truth marks scattered noise as its own class:
the affinity graph structurally contains only the event communities (the
eigengap count is correct at k=events), so without the bucket noise rows
are forced into events and global NMI is capped (round-4 serving crisis
NMI 0.62 vs 0.885 for the labels-quirk engine — VERDICT r4 next #4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mused_tpu.ops import kmeans as km
from mused_tpu.ops import matching
from mused_tpu.utils import metrics as m


def _sphere_clusters(rng, k=4, per=60, d=8, spread=0.02):
    """Tight unit-norm clusters around k random directions."""
    dirs = rng.normal(size=(k, d))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x = np.repeat(dirs, per, axis=0) + rng.normal(size=(k * per, d)) * spread
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    labels = np.repeat(np.arange(k), per)
    return x.astype(np.float32), labels


def test_mark_background_flags_planted_far_mode():
    rng = np.random.default_rng(0)
    x, labels = _sphere_clusters(rng)
    # plant scattered background rows: random directions, assigned to
    # cluster 0 (as a forced clustering would do)
    noise = rng.normal(size=(40, x.shape[1]))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    xa = np.concatenate([x, noise.astype(np.float32)])
    la = np.concatenate([labels, np.zeros(40, np.int64)])
    out = np.asarray(km.mark_background(jnp.asarray(xa),
                                        jnp.asarray(la, jnp.int32), k_max=6))
    flagged = out == -1
    # most planted noise flagged, almost no clean rows flagged
    assert flagged[len(x):].mean() > 0.8, flagged[len(x):].mean()
    assert flagged[:len(x)].mean() < 0.05, flagged[:len(x)].mean()
    # non-flagged labels unchanged
    assert np.array_equal(out[~flagged], la[~flagged])


def test_mark_background_clean_window_is_untouched():
    rng = np.random.default_rng(1)
    x, labels = _sphere_clusters(rng)
    out = np.asarray(km.mark_background(jnp.asarray(x),
                                        jnp.asarray(labels, jnp.int32),
                                        k_max=6))
    # unimodal residuals fail the angular floor: nothing flagged
    assert not np.any(out == -1)
    assert np.array_equal(out, labels)


def test_centroid_matcher_passes_background_through():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(30, 4))
    clusters = np.array([0] * 10 + [1] * 10 + [-1] * 10)
    mm = matching.CentroidMatcher()
    out1 = mm.match(feats, clusters)
    assert np.array_equal(out1[-10:], [-1] * 10)
    assert -1 not in mm.ids                       # never registered
    # second window: same geometry, ids stay stable, -1 stays -1
    out2 = mm.match(feats + 0.01, clusters)
    assert np.array_equal(out2, out1)


def test_positional_matching_passes_background_through():
    prev = np.array([0] * 20 + [1] * 20 + [-1] * 8)
    new = np.array([5] * 20 + [7] * 20 + [-1] * 8)
    out = matching.match_clusters(prev, new, method="hungarian",
                                  min_overlap=3)
    assert np.array_equal(out[:20], [0] * 20)
    assert np.array_equal(out[20:40], [1] * 20)
    assert np.array_equal(out[40:], [-1] * 8)


@pytest.fixture(scope="module")
def crisis():
    from mused_tpu.data.synthetic import crisis_embedding_stream
    return crisis_embedding_stream(n_rows=2048, n_events=4, noise_rate=0.3,
                                   d_text=128, d_image=128, seed=3)


def _serve(crisis, background, wpb=None, chunk=128):
    from mused_tpu.serving import StreamDetector
    from mused_tpu.utils.config import PipelineConfig
    mods, mtypes, labels = crisis
    cfg = PipelineConfig(window_size=256, reduced_dim=32, k_basis=8,
                         approach="sSpectral", label_mode="all",
                         n_clusters_override=16, matching="centroid",
                         k_estimate="eigengap", background_bucket=background,
                         windows_per_batch=wpb)
    det = StreamDetector(mtypes, 256, cfg=cfg, max_lag=2)
    out = []
    for lo in range(0, 2048, chunk):
        out.extend(det.push([mm[lo:lo + chunk] for mm in mods]))
    out.extend(det.flush())
    out.sort(key=lambda r: r.window_index)
    clus = np.concatenate([r.clusters for r in out])
    return out, clus, labels[:len(clus)]


def test_background_improves_crisis_nmi(crisis):
    _, off, truth = _serve(crisis, background=False)
    _, on, truth = _serve(crisis, background=True)
    assert np.any(on == -1)                       # bucket actually fired
    assert m.nmi(truth, on) > m.nmi(truth, off) + 0.05
    # events-only quality must stay close (a few boundary rows may flag)
    assert m.nmi_events_only(truth, on) >= m.nmi_events_only(truth, off) - 0.05


def test_background_scanned_matches_per_window(crisis):
    _, per_win, _ = _serve(crisis, background=True, wpb=1)
    _, scanned, _ = _serve(crisis, background=True, wpb=4)
    assert np.array_equal(per_win, scanned)


def test_background_huge_window_blocked_path(crisis):
    """force_blocked_window routes through the blocked (huge-window) code:
    the bucket must fire there too (labels_from_ritz / sketch-space kmeans
    — round 5 extended it past the dense steps)."""
    from mused_tpu import api
    from mused_tpu.utils.config import PipelineConfig
    mods, mtypes, labels = crisis
    for approach in ("sSpectral", "sSVDMC"):
        # positional matching: huge windows have no centroid registry;
        # match_clusters passes the -1 bucket through either way
        cfg = PipelineConfig(window_size=256, reduced_dim=32, k_basis=8,
                             approach=approach, label_mode="all",
                             n_clusters_override=16,
                             k_estimate="eigengap", background_bucket=True,
                             force_blocked_window=True)
        r, _ = api.get_initial_results()
        r = api.process_streaming_data(
            results=r, data_modalities=[m[:1024] for m in mods],
            modality_types=mtypes, window_size=256, reduced_dim=32,
            k_basis=8, n_clusters_total=16, seed=0, approach=approach,
            complete_true_labels=labels[:1024], step_window_ratio=1,
            noise_rate=0.3, label_mode="all", sorting=False, eps=1.5,
            min_samples=2, cfg=cfg)
        assert len(r["f1_score"]) == 1 and np.isfinite(r["nmi_score"][0])
        # and the bucket actually FIRES through the blocked path: drive
        # one window at the engine level and look for the -1 class.
        # Asserted for sSpectral (NJW sphere — the validated geometry);
        # the sketch-space kmeans guards may legitimately not fire on a
        # given window, so sSVDMC asserts completion only.
        from mused_tpu.engine.streaming import StreamingEngine
        eng = StreamingEngine(cfg)
        clusters = eng.process_window([mm[:256] for mm in mods], mtypes,
                                      labels[:256], 0, None)
        if approach == "sSpectral":
            assert np.any(np.asarray(clusters) == -1), approach
