"""Checkpoint/resume: interrupted stream == uninterrupted stream."""
import os

import numpy as np
import pytest

from mused_tpu import api
from mused_tpu.data.synthetic import synthetic_events_dataframe
from mused_tpu.utils import checkpoint as ckpt


def run_stream(mods, mtypes, labels, approach, checkpoint_dir=None, stop_after=None):
    """Run the streaming pipeline, optionally aborting after N windows."""
    from mused_tpu.engine import streaming
    results, _ = api.get_initial_results()
    if stop_after is not None:
        # simulate a crash: monkey-patch the engine loop via a truncated stream
        orig = streaming.StreamingEngine.dispatch_window
        calls = {"n": 0}

        def bomb(self, *a, **k):
            if calls["n"] >= stop_after:
                raise KeyboardInterrupt("simulated crash")
            calls["n"] += 1
            return orig(self, *a, **k)

        streaming.StreamingEngine.dispatch_window = bomb
        try:
            with pytest.raises(KeyboardInterrupt):
                api.process_streaming_data(
                    results=results, data_modalities=mods, modality_types=mtypes,
                    window_size=64, reduced_dim=8, k_basis=3, n_clusters_total=2,
                    seed=0, approach=approach, complete_true_labels=labels,
                    step_window_ratio=1, noise_rate=0.5, label_mode="binary",
                    sorting=True, eps=1.5, min_samples=2,
                    checkpoint_dir=checkpoint_dir)
        finally:
            streaming.StreamingEngine.dispatch_window = orig
        return None
    return api.process_streaming_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        window_size=64, reduced_dim=8, k_basis=3, n_clusters_total=2,
        seed=0, approach=approach, complete_true_labels=labels,
        step_window_ratio=1, noise_rate=0.5, label_mode="binary",
        sorting=True, eps=1.5, min_samples=2, checkpoint_dir=checkpoint_dir)


@pytest.fixture(scope="module")
def stream_fixture():
    df = synthetic_events_dataframe(n_rows=420, n_events=4, noise_rate=0.5, seed=0)
    return api.prepare_modalities(df, subset_size=256, sort_by_uploaded=True,
                                  binary=True, noise_rate=0.5, seed=0)


@pytest.mark.parametrize("approach", ["SWFDMC", "sSVDMC_mini"])
def test_crash_resume_matches_uninterrupted(tmp_path, stream_fixture, approach):
    mods, mtypes, labels = stream_fixture
    straight = run_stream(mods, mtypes, labels, approach)

    ckdir = str(tmp_path / approach)
    run_stream(mods, mtypes, labels, approach, checkpoint_dir=ckdir,
               stop_after=2)              # crash after 2 of 4 windows
    assert ckpt.latest_checkpoint(ckdir) is not None
    resumed = run_stream(mods, mtypes, labels, approach, checkpoint_dir=ckdir)

    # identical metrics after resume (deterministic per-window keys)
    assert resumed["f1_score"][0] == pytest.approx(straight["f1_score"][0], abs=1e-6)
    assert resumed["nmi_score"][0] == pytest.approx(straight["nmi_score"][0], abs=1e-6)


def test_checkpoint_roundtrip_pytree(tmp_path):
    from mused_tpu.ops import swfd
    st = swfd.init(64, 64, 8, block_rows=64)
    host = {"next_window": 3, "prev_clusters": np.array([1, 2, 3]),
            "all_clusters": [np.zeros(4)], "all_true_labels": [np.ones(4)],
            "swfd_R": 2.5, "prev_centroids": None, "prev_centroid_labels": None,
            "incr_buf": None, "incr_labels": None}
    path = ckpt.save_checkpoint(str(tmp_path / "stream_00000003.npz"), st, host)
    dev2, host2 = ckpt.load_checkpoint(path)
    assert host2["next_window"] == 3
    np.testing.assert_array_equal(host2["prev_clusters"], [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(dev2.blocks), np.asarray(st.blocks))
    assert ckpt.latest_checkpoint(str(tmp_path)) == path


def test_batched_mode_with_checkpointing_falls_back(tmp_path, stream_fixture):
    """windows_per_batch>1 + checkpoint_dir: the batched loop saves at group
    boundaries (the device state is only window-consistent between
    dispatches) — checkpoints appear and the run completes."""
    from mused_tpu.utils.config import PipelineConfig
    mods, mtypes, labels = stream_fixture
    ckdir = str(tmp_path / "batched")
    cfg = PipelineConfig(window_size=64, reduced_dim=8, k_basis=3,
                         approach="sSVDMC", label_mode="binary",
                         n_clusters_override=2, windows_per_batch=4)
    results, _ = api.get_initial_results()
    results = api.process_streaming_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        window_size=64, reduced_dim=8, k_basis=3, n_clusters_total=2,
        seed=0, approach="sSVDMC", complete_true_labels=labels,
        step_window_ratio=1, noise_rate=0.5, label_mode="binary",
        sorting=True, eps=1.5, min_samples=2, cfg=cfg,
        checkpoint_dir=ckdir)
    assert ckpt.latest_checkpoint(ckdir) is not None
    assert len(results["f1_score"]) == 1


def test_crash_resume_with_centroid_matching(tmp_path):
    """Crash-resume equivalence when the centroid-registry matcher carries
    cross-window state (snapshot/restore through the checkpoint)."""
    from mused_tpu.data.synthetic import crisis_embedding_stream
    from mused_tpu.utils.config import PipelineConfig

    window, subset = 64, 448
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=subset, n_events=3, noise_rate=0.3, d_text=32, d_image=32,
        seed=0)
    cfg = PipelineConfig(window_size=window, reduced_dim=16, k_basis=4,
                         approach="sSpectral", label_mode="all",
                         n_clusters_override=4, eps=1.5, min_samples=2,
                         matching="centroid")

    def run(checkpoint_dir=None, stop_after=None):
        from mused_tpu.engine import streaming
        results, _ = api.get_initial_results()
        kwargs = dict(
            results=results, data_modalities=mods, modality_types=mtypes,
            window_size=window, reduced_dim=16, k_basis=4, n_clusters_total=4,
            seed=0, approach="sSpectral", complete_true_labels=labels,
            step_window_ratio=1, noise_rate=0.3, label_mode="all",
            sorting=False, eps=1.5, min_samples=2, cfg=cfg,
            checkpoint_dir=checkpoint_dir)
        if stop_after is None:
            return api.process_streaming_data(**kwargs)
        orig = streaming.StreamingEngine.dispatch_window
        calls = {"n": 0}

        def bomb(self, *a, **k):
            if calls["n"] >= stop_after:
                raise KeyboardInterrupt("simulated crash")
            calls["n"] += 1
            return orig(self, *a, **k)

        streaming.StreamingEngine.dispatch_window = bomb
        try:
            with pytest.raises(KeyboardInterrupt):
                api.process_streaming_data(**kwargs)
        finally:
            streaming.StreamingEngine.dispatch_window = orig
        return None

    straight = run()
    ckdir = str(tmp_path / "centroid")
    run(checkpoint_dir=ckdir, stop_after=3)
    assert ckpt.latest_checkpoint(ckdir) is not None
    resumed = run(checkpoint_dir=ckdir)
    assert resumed["nmi_score"][-1] == pytest.approx(straight["nmi_score"][-1])
    assert resumed["f1_score"][-1] == pytest.approx(straight["f1_score"][-1])


def test_batched_crash_resume_matches_uninterrupted(tmp_path, stream_fixture):
    """Crash mid-stream under batched dispatch, auto-resume, and the full
    metrics equal the uninterrupted batched run (resume re-forms groups from
    the saved window boundary; the scanned step is batching-invariant)."""
    from mused_tpu.engine import streaming
    from mused_tpu.utils.config import PipelineConfig
    mods, mtypes, labels = stream_fixture

    def run(ckdir=None, crash_after=None):
        cfg = PipelineConfig(window_size=64, reduced_dim=8, k_basis=3,
                             approach="sSVDMC", label_mode="binary",
                             n_clusters_override=2, windows_per_batch=2)
        results, _ = api.get_initial_results()
        if crash_after is not None:
            orig = streaming._run_batched_loop
            calls = {"n": 0}

            def bomb(*a, **k):
                # crash inside the loop after `crash_after` groups by
                # truncating todo (simulates dying mid-stream post-save)
                a = list(a)
                a[3] = a[3][:crash_after * 2]     # todo, 2 windows/group
                return orig(*a, **k)

            streaming._run_batched_loop = bomb
            try:
                api.process_streaming_data(
                    results=results, data_modalities=mods,
                    modality_types=mtypes, window_size=64, reduced_dim=8,
                    k_basis=3, n_clusters_total=2, seed=0, approach="sSVDMC",
                    complete_true_labels=labels, step_window_ratio=1,
                    noise_rate=0.5, label_mode="binary", sorting=True,
                    eps=1.5, min_samples=2, cfg=cfg, checkpoint_dir=ckdir)
            finally:
                streaming._run_batched_loop = orig
            return None
        return api.process_streaming_data(
            results=results, data_modalities=mods, modality_types=mtypes,
            window_size=64, reduced_dim=8, k_basis=3, n_clusters_total=2,
            seed=0, approach="sSVDMC", complete_true_labels=labels,
            step_window_ratio=1, noise_rate=0.5, label_mode="binary",
            sorting=True, eps=1.5, min_samples=2, cfg=cfg,
            checkpoint_dir=ckdir)

    straight = run()
    ckdir = str(tmp_path / "batched_resume")
    run(ckdir=ckdir, crash_after=1)              # processes only group 1
    assert ckpt.latest_checkpoint(ckdir) is not None
    resumed = run(ckdir=ckdir)                   # auto-resume to the end
    assert resumed["f1_score"] == pytest.approx(straight["f1_score"], abs=1e-6)
    assert resumed["nmi_score"] == pytest.approx(straight["nmi_score"], abs=1e-6)
