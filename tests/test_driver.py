"""Sweep driver, CLI, output generation, tee (L5/L1 layers)."""
import os

import numpy as np
import pytest

from mused_tpu.utils import output, tee


@pytest.fixture
def fake_metrics():
    return {
        "sSVDMC": {"noise_rate": [0.1, 0.5], "f1_score": [0.8, 0.6],
                   "processing_time": [1.0, 2.0]},
        "SWFDMC": {"noise_rate": [0.1, 0.5], "f1_score": [0.7, 0.65],
                   "processing_time": [0.5, 0.9]},
    }


def test_log_metrics_layout(tmp_path, fake_metrics):
    path = output.log_metrics(fake_metrics, "noise_rate", "mode=binary",
                              save_path=str(tmp_path) + "/")
    assert os.path.basename(path) == "exp=noise_rate,mode=binary.txt"
    body = open(path).read()
    assert "sSVDMC" in body and "SWFDMC" in body


def test_visualize_results_writes_pngs(tmp_path, fake_metrics):
    written = output.visualize_results(
        fake_metrics, "noise_rate", ["noise_rate"], "mode=binary",
        save_path=str(tmp_path) + "/")
    assert len(written) == 2  # f1_score + processing_time
    for w in written:
        assert os.path.exists(w) and w.endswith(".png")
        assert "noise_rate" in w


def test_log_averages_works(tmp_path, fake_metrics):
    """The reference's version is dead code that would crash; ours must work."""
    path = output.log_averages(fake_metrics, "noise_rate", "",
                               save_path=str(tmp_path) + "/")
    body = open(path).read()
    assert "F1 score" in body
    assert "0.7" in body  # mean of [0.8, 0.6]


def test_generate_table(tmp_path, fake_metrics):
    path = output.generate_table(fake_metrics, "f1_score", "noise_rate",
                                 save_path=str(tmp_path) + "/")
    body = open(path).read()
    assert "\\begin{table}" in body and "0.8000" in body and "N/A" not in body


def test_visualize_clusters(tmp_path, rng):
    x = rng.normal(size=(40, 8)).astype(np.float32)
    out = output.visualize_clusters(x, rng.integers(0, 3, 40),
                                    save_path=str(tmp_path) + "/")
    assert out is None or os.path.exists(out)


def test_tee_roundtrip(tmp_path, capsys):
    import sys
    before = sys.stdout       # pytest's capture wrapper, not sys.__stdout__
    log = tee.setup_logging(str(tmp_path))
    try:
        print("hello-tee")
    finally:
        tee.teardown_logging(log)
    files = os.listdir(tmp_path)
    assert len(files) == 1
    assert "hello-tee" in open(os.path.join(tmp_path, files[0])).read()
    # restore() unwinds to whatever was active at setup (so outer tees /
    # pytest capture keep working), not blindly to sys.__stdout__
    assert sys.stdout is before


@pytest.mark.slow
def test_cli_demo_sweep(tmp_path, monkeypatch):
    """python -m mused_tpu.main --dataset demo runs the reference's demo
    config end-to-end (2 label modes x approaches) and writes logs+plots."""
    monkeypatch.chdir(tmp_path)
    from mused_tpu.main import cli
    rc = cli(["--dataset", "demo", "--approaches", "sSVDMC", "SWFDMC",
              "--no-tee", "--second-pass-label-mode", "none"])
    assert rc == 0
    logs = os.listdir(tmp_path / "logs")
    assert any(l.startswith("exp=label_mode") for l in logs)
    assert os.path.isdir(tmp_path / "plots" / "label_mode")


def test_cli_parser_defaults():
    from mused_tpu.main import build_parser
    args = build_parser().parse_args([])
    # reference default_params (main.py:303-313)
    assert args.subset_size == 150000
    assert args.noise_rate == 0.95
    assert args.window_size == 2000
    assert args.reduced_dim == 50 and args.k_basis == 50
    assert args.label_mode == "binary" and args.sorting is False


def test_synthetic_dataset_survives_noise_sweep():
    """Regression (review finding): --dataset synthetic must have a noise pool
    large enough for every sweep noise_rate up to 0.95."""
    import argparse
    from mused_tpu.main import load_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    args = argparse.Namespace(dataset="synthetic", subset_size=4000, seed=0,
                              dataset_dir="")
    df = load_dataframe(args)
    for rate in (0.05, 0.5, 0.95):
        mods, _, labels = prepare_modalities(df, subset_size=4000,
                                             noise_rate=rate, seed=0)
        assert len(labels) == min(4000, len(df))


def test_batch_dense_cap_routes_to_blocked(monkeypatch):
    """Regression (review finding): subsets beyond the dense cap must reach
    the blocked path instead of raising."""
    from mused_tpu.engine import batch as batch_mod
    from mused_tpu.data.synthetic import crisis_embedding_stream
    from mused_tpu import api
    monkeypatch.setattr(batch_mod, "MAX_DENSE_ROWS", 100)  # force the branch
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=192, n_events=3, noise_rate=0.2, d_text=32, d_image=32, seed=5)
    results, _ = api.get_initial_results()
    results = api.process_batch_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        reduced_dim=8, k_basis=4, n_clusters=4, seed=0,
        approach="SVDMC_batch", complete_true_labels=labels, noise_rate=0.2,
        label_mode="all", sorting=False, eps=1.5, min_samples=2,
        min_cluster_size=3, window_size=64)
    assert len(results["f1_score"]) == 1


@pytest.mark.slow
def test_parallel_sweep_driver_matches_sequential(tmp_path, monkeypatch):
    """--parallel-sweep: the concurrent (approach, value) grid merges into
    the same per-approach results as the sequential driver (SURVEY.md §5.8)
    EXACTLY, at a noise rate where the reference's order-dependent
    params-mutation quirk (main.py:196) actually mutates — the two-phase
    driver chains the measured rates through the sweep order before fanning
    out, so parallel == sequential including the quirk."""
    monkeypatch.chdir(tmp_path)
    from mused_tpu import main as m
    from mused_tpu.data.synthetic import synthetic_events_dataframe

    df = synthetic_events_dataframe(n_rows=400, n_events=5, noise_rate=0.5,
                                    seed=0)
    captured = {}
    monkeypatch.setattr(m.output, "log_metrics",
                        lambda metrics, **kw: captured.update(run=metrics))
    monkeypatch.setattr(m.output, "visualize_results", lambda **kw: None)

    fixed = {"seed": 0, "subset_size": 192, "noise_rate": 0.5,
             "label_mode": "binary", "sorting": False, "window_size": 64,
             "reduced_dim": 8, "k_basis": 3, "step_window_ratio": 1}
    out = {}
    for mode in ("seq", "par"):
        m.run_experiment(df, "window_size", [32, 64], ["sSVDMC", "SWFDMC"],
                         fixed.copy(), 0, log_dir=str(tmp_path),
                         plot_dir=str(tmp_path), parallel=(mode == "par"))
        out[mode] = captured.pop("run")

    for approach in ("sSVDMC", "SWFDMC"):
        seq, par = out["seq"][approach], out["par"][approach]
        assert set(seq) == set(par)
        for key in seq:
            if key == "processing_time":
                assert len(seq[key]) == len(par[key])
                continue
            assert seq[key] == par[key], (approach, key, seq[key], par[key])
