"""Serving surface (mused_tpu/serving.py) — the push-based online detector.

The reference has no serving/online entry point (its only engine,
main.py:13-130, takes the whole stream + ground-truth labels up front); these
tests pin the framework's production-facing contract: chunking-invariance,
label-free cluster counts, trigger parity with the offline engine,
save/load resume, and sliding-window mode.
"""
import numpy as np
import pytest

from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.data.synthetic import synthetic_events_dataframe, \
    crisis_embedding_stream
from mused_tpu.engine.streaming import window_triggers
from mused_tpu.serving import StreamDetector
from mused_tpu.utils.config import PipelineConfig
from mused_tpu.utils.metrics import nmi


@pytest.fixture(scope="module")
def stream():
    df = synthetic_events_dataframe(n_rows=900, n_events=4, noise_rate=0.5,
                                    seed=0)
    return prepare_modalities(df, subset_size=512, binary=False,
                              sort_by_uploaded=True, noise_rate=0.4, seed=0)


def _run(mods, mtypes, chunk, **kw):
    kw.setdefault("approach", "sSVDMC")
    kw.setdefault("reduced_dim", 16)
    kw.setdefault("k_basis", 4)
    kw.setdefault("max_events", 8)
    det = StreamDetector(mtypes, 128, seed=0, **kw)
    out = []
    n = len(mods[0])
    for lo in range(0, n, chunk):
        out.extend(det.push([m[lo:lo + chunk] for m in mods]))
    out.extend(det.flush())
    return det, out


@pytest.mark.slow
def test_chunking_invariance(stream):
    """Identical windows/results however the stream is chopped into pushes."""
    mods, mtypes, _ = stream
    _, a = _run(mods, mtypes, 512)      # one push
    _, b = _run(mods, mtypes, 7)        # awkward chunks
    _, c = _run(mods, mtypes, 1)        # record at a time
    assert len(a) == len(b) == len(c) == 4
    for x, y in zip(a, b):
        assert x.window_index == y.window_index
        assert x.row_start == y.row_start
        assert np.array_equal(x.clusters, y.clusters)
    for x, y in zip(a, c):
        assert np.array_equal(x.clusters, y.clusters)


def test_trigger_parity_with_offline_engine(stream):
    """Serving fires at exactly the offline trigger indices (ref main.py:32)
    and its row_start/window_index bookkeeping matches."""
    mods, mtypes, _ = stream
    _, out = _run(mods, mtypes, 64)
    expected = window_triggers(512, 128, 1)
    assert [r.row_start + 128 - 1 for r in out] == expected
    assert [r.window_index for r in out] == list(range(len(expected)))


def test_unsupervised_quality_and_event_tracking(stream):
    """Eigengap-counted serving clusters carry real signal (NMI vs the truth
    labels serving never saw) and event bookkeeping is consistent."""
    mods, mtypes, labels = stream
    _, out = _run(mods, mtypes, 128, k_estimate="eigengap")
    clus = np.concatenate([r.clusters for r in out])
    assert nmi(np.asarray(labels)[:len(clus)], clus) > 0.15
    seen: set = set()
    for r in out:
        assert set(r.new_events.tolist()) == set(r.event_ids.tolist()) - seen
        seen |= set(r.event_ids.tolist())
        assert r.counts.sum() == 128
        assert len(r.clusters) == 128


def test_save_load_resume(stream, tmp_path):
    """Resume from a mid-stream checkpoint == uninterrupted run."""
    mods, mtypes, _ = stream
    det_full, full = _run(mods, mtypes, 128)

    det = StreamDetector(mtypes, 128, approach="sSVDMC", reduced_dim=16,
                         k_basis=4, max_events=8, seed=0)
    out = []
    for lo in range(0, 256, 128):
        out.extend(det.push([m[lo:lo + 128] for m in mods]))
    path = str(tmp_path / "det.npz")
    out.extend(det.save(path))   # save flushes and returns the results

    det2 = StreamDetector.load(path)
    for lo in range(256, 512, 128):
        out.extend(det2.push([m[lo:lo + 128] for m in mods]))
    out.extend(det2.flush())
    assert len(out) == len(full)
    for x, y in zip(out, full):
        assert np.array_equal(x.clusters, y.clusters), x.window_index


def test_sliding_windows(stream):
    """step_window_ratio=2: overlapping windows fire twice per window span."""
    mods, mtypes, _ = stream
    _, out = _run(mods, mtypes, 64, step_window_ratio=2)
    expected = window_triggers(512, 128, 2)
    assert [r.row_start + 128 - 1 for r in out] == expected
    assert len(out) == 7


def test_centroid_matching_numeric_stream():
    """Embedding streams serve with the centroid-registry matcher."""
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=512, n_events=4, noise_rate=0.3, d_text=32, d_image=32, seed=0)
    det = StreamDetector(mtypes, 128, approach="sSpectral", reduced_dim=32,
                         k_basis=4, max_events=6, k_estimate="fixed",
                         matching="centroid", seed=0)
    out = det.push(mods)
    out.extend(det.flush())
    assert len(out) == 4
    clus = np.concatenate([r.clusters for r in out])
    assert nmi(np.asarray(labels), clus) > 0.5


def test_rejects_label_leak_and_bad_shapes(stream):
    mods, mtypes, _ = stream
    with pytest.raises(ValueError, match="unsupervised"):
        StreamDetector(mtypes, 128, k_estimate="labels")
    det = StreamDetector(mtypes, 128, max_events=8)
    with pytest.raises(ValueError, match="modality"):
        det.push([mods[0][:4]])
    with pytest.raises(ValueError, match="record count"):
        det.push([m[:3] for m in mods[:-1]] + [mods[-1][:2]])


@pytest.mark.slow
def test_serving_composes_with_data_shards(stream):
    """Production serving on a mesh: a detector configured with
    data_shards=4 runs every window step SPMD and — for a deterministic-
    reduction approach — reproduces the single-chip detector's outputs
    exactly (the engine's sharded step is bit-equal for sSVDMC)."""
    mods, mtypes, _ = stream

    def run(shards):
        cfg = PipelineConfig(window_size=128, reduced_dim=16, k_basis=4,
                             approach="sSVDMC", label_mode="all",
                             n_clusters_override=8, k_estimate="eigengap",
                             data_shards=shards)
        det = StreamDetector(mtypes, 128, cfg=cfg)
        out = []
        for lo in range(0, len(mods[0]), 64):
            out.extend(det.push([m[lo:lo + 64] for m in mods]))
        out.extend(det.flush())
        return out

    one, four = run(1), run(4)
    assert len(one) == len(four) == 4
    for x, y in zip(one, four):
        assert np.array_equal(x.clusters, y.clusters)
        assert np.array_equal(x.new_events, y.new_events)


@pytest.mark.slow
def test_serving_huge_window_columns_layout(stream):
    """Serving on the rematerialized huge-window path with the features
    column-sharded (the capacity layout) — runs end-to-end and detects."""
    mods, mtypes, _ = stream
    cfg = PipelineConfig(window_size=128, reduced_dim=16, k_basis=4,
                         approach="SWFDMC", label_mode="all",
                         n_clusters_override=8, k_estimate="eigengap",
                         data_shards=4, force_blocked_window=True,
                         huge_window_layout="columns")
    det = StreamDetector(mtypes, 128, cfg=cfg)
    out = []
    for lo in range(0, len(mods[0]), 128):
        out.extend(det.push([m[lo:lo + 128] for m in mods]))
    out.extend(det.flush())
    assert len(out) == 4
    assert all(len(r.event_ids) >= 1 for r in out)


def _serve_all(mods, mtypes, chunk, cfg, max_lag=2):
    det = StreamDetector(mtypes, cfg.window_size, cfg=cfg, max_lag=max_lag)
    out = []
    n = len(mods[0])
    for lo in range(0, n, chunk):
        out.extend(det.push([m[lo:lo + chunk] for m in mods]))
    out.extend(det.flush())
    return out


def _cfg(approach="sSVDMC", wpb=1):
    return PipelineConfig(window_size=128, reduced_dim=16, k_basis=4,
                          approach=approach, label_mode="all",
                          n_clusters_override=8, k_estimate="eigengap",
                          windows_per_batch=wpb)


@pytest.mark.slow
def test_scanned_serving_matches_per_window(stream):
    """windows_per_batch>1 in serving: one scanned dispatch per W ready
    windows (VERDICT r2 next #5) must reproduce per-window serving exactly —
    including the mixed regime where a partial tail group falls back to
    per-window dispatch at flush (7 windows = one scanned-4 group + 3
    per-window), with the SWFD state threading through both."""
    df = synthetic_events_dataframe(n_rows=1500, n_events=4, noise_rate=0.5,
                                    seed=1)
    mods, mtypes, _ = prepare_modalities(df, subset_size=896, binary=False,
                                         sort_by_uploaded=True,
                                         noise_rate=0.4, seed=1)
    for approach in ("sSVDMC", "SWFDMC"):
        a = _serve_all(mods, mtypes, 96, _cfg(approach, wpb=1))
        b = _serve_all(mods, mtypes, 96, _cfg(approach, wpb=4))
        assert len(a) == len(b) == 7
        for x, y in zip(a, b):
            assert x.window_index == y.window_index
            assert x.row_start == y.row_start
            assert np.array_equal(x.clusters, y.clusters), (approach,
                                                            x.window_index)


def test_scanned_serving_chunk_invariance_and_save_load(stream, tmp_path):
    """Batched serving stays chunking-invariant, and save() mid-group
    (which flushes the partial group per-window) resumes exactly."""
    df = synthetic_events_dataframe(n_rows=1500, n_events=4, noise_rate=0.5,
                                    seed=1)
    mods, mtypes, _ = prepare_modalities(df, subset_size=896, binary=False,
                                         sort_by_uploaded=True,
                                         noise_rate=0.4, seed=1)
    a = _serve_all(mods, mtypes, 896, _cfg(wpb=4))
    b = _serve_all(mods, mtypes, 13, _cfg(wpb=4))
    for x, y in zip(a, b):
        assert np.array_equal(x.clusters, y.clusters)

    # save after 5 windows (one full group dispatched + 1 buffered) plus a
    # 7-row partial buffer.  The pre-save pushes must stop exactly at the
    # cut: an earlier version pushed m[lo:lo+128] past it, double-feeding
    # 121 rows after resume — invisible while the old eigengap estimator
    # collapsed every window to k=1 (all-one-cluster labels compare equal
    # for ANY rows), caught the moment the estimator produced real counts.
    det = StreamDetector(mtypes, 128, cfg=_cfg(wpb=4), max_lag=2)
    out = []
    cut = 5 * 128 + 7
    for lo in range(0, cut, 128):
        out.extend(det.push([m[lo:min(lo + 128, cut)] for m in mods]))
    path = str(tmp_path / "det.ckpt")
    out.extend(det.save(path))
    det2 = StreamDetector.load(path)
    for lo in range(cut, 896, 128):
        out.extend(det2.push([m[lo:min(lo + 128, 896)] for m in mods]))
    out.extend(det2.flush())
    assert len(out) == 7
    for x, y in zip(a, out):
        assert x.window_index == y.window_index
        assert np.array_equal(x.clusters, y.clusters)


def test_serving_clamps_scanned_for_non_batchable_approach():
    """Explicit windows_per_batch>1 with a host-clustered approach must be
    clamped to per-window dispatch in serving too — the scanned body has no
    DBSCAN glue and would silently emit placeholder labels (review r3
    finding #1, reproduced before the clamp)."""
    df = synthetic_events_dataframe(n_rows=1500, n_events=4, noise_rate=0.5,
                                    seed=1)
    mods, mtypes, _ = prepare_modalities(df, subset_size=512, binary=False,
                                         sort_by_uploaded=True,
                                         noise_rate=0.4, seed=1)
    a = _serve_all(mods, mtypes, 512, _cfg("DBSCAN_incr", wpb=1))
    b = _serve_all(mods, mtypes, 512, _cfg("DBSCAN_incr", wpb=4))
    assert len(a) == len(b) == 4
    assert any(len(np.unique(w.clusters)) > 1 for w in a)  # real labels
    for x, y in zip(a, b):
        assert np.array_equal(x.clusters, y.clusters)


def test_push_detaches_from_caller_buffer(stream):
    """push() must copy: a caller reusing (mutating) its chunk buffer
    after push must not corrupt later windows (review r5 finding —
    the retained tail aliased the caller's arrays on the no-fire path)."""
    mods, mtypes, labels = stream
    det_a = StreamDetector(mtypes, 128, approach="sSVDMC", reduced_dim=16,
                           k_basis=4, max_events=8, k_estimate="fixed")
    det_b = StreamDetector(mtypes, 128, approach="sSVDMC", reduced_dim=16,
                           k_basis=4, max_events=8, k_estimate="fixed")
    out_a, out_b = [], []
    bufs = [np.empty_like(m[:100]) for m in mods]
    for lo in range(0, 512, 100):
        hi = min(lo + 100, 512)
        chunk = [m[lo:hi] for m in mods]
        # detector A: pushed a REUSED buffer that is overwritten afterwards
        for b, c in zip(bufs, chunk):
            b[:hi - lo] = c
        out_a.extend(det_a.push([b[:hi - lo] for b in bufs]))
        for b in bufs:
            b[:] = -777.0                     # caller clobbers its buffer
        # detector B: pushed fresh arrays
        out_b.extend(det_b.push([c.copy() for c in chunk]))
    out_a.extend(det_a.flush())
    out_b.extend(det_b.flush())
    assert len(out_a) == len(out_b) == 4
    for x, y in zip(out_a, out_b):
        assert np.array_equal(x.clusters, y.clusters)
