"""Profiling, ingest, and config utilities."""
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mused_tpu.data.ingest import WindowPrefetcher
from mused_tpu.utils import profiling
from mused_tpu.utils.config import PipelineConfig, demo_config


def test_span_timer_sync_callable():
    t = profiling.SpanTimer()
    out = {}
    with t.span("work", sync=lambda: out["x"]):
        out["x"] = jnp.ones((8, 8)) * 2
        time.sleep(0.01)
    s = t.summary()
    assert s["work"]["count"] == 1
    assert s["work"]["mean_ms"] >= 10.0


def test_span_timer_summary_percentiles():
    t = profiling.SpanTimer()
    for _ in range(5):
        with t.span("a"):
            pass
    s = t.summary()["a"]
    assert s["count"] == 5 and s["p95_ms"] >= s["p50_ms"] >= 0


def test_prefetcher_order_and_close():
    seen = []

    def featurize(i):
        seen.append(i)
        return np.full((4,), i)

    pf = WindowPrefetcher(featurize, n_windows=5, depth=2)
    got = [int(np.asarray(x)[0]) for x in pf]
    assert got == [0, 1, 2, 3, 4]
    pf.close()


def test_prefetcher_partial_consumption_then_close():
    pf = WindowPrefetcher(lambda i: np.full((2,), i), n_windows=10, depth=3)
    it = iter(pf)
    next(it); next(it)
    pf.close()   # must not hang or raise


def test_config_reference_defaults():
    cfg = PipelineConfig()
    assert (cfg.subset_size, cfg.noise_rate, cfg.window_size) == (150000, 0.95, 2000)
    assert (cfg.reduced_dim, cfg.k_basis, cfg.step_window_ratio) == (50, 50, 1)
    assert (cfg.eps, cfg.min_samples, cfg.min_cluster_size) == (1.5, 2, 3)
    assert cfg.n_clusters_total == 2
    assert cfg.replace(label_mode="types").n_clusters_total == 4
    assert cfg.replace(label_mode="all").n_clusters_total == 150
    assert cfg.replace(n_clusters_override=7).n_clusters_total == 7
    d = demo_config()
    assert (d.subset_size, d.window_size, d.reduced_dim, d.k_basis) == (100, 8, 2, 1)


def test_device_trace_writes(tmp_path):
    with profiling.device_trace(str(tmp_path)):
        jnp.ones((4, 4)).sum().block_until_ready()
    import os
    assert any(os.scandir(str(tmp_path)))


def test_tee_sessions_nest(tmp_path, capsys):
    """Regression (r2 review): an inner log session must chain to the outer
    one (output reaches both files) and restore() must unwind to the OUTER
    tee, not to the raw console."""
    import sys
    from mused_tpu.utils import tee
    a = tee.setup_logging(str(tmp_path / "a"))
    print("line-for-a")
    b = tee.setup_logging(str(tmp_path / "b"))
    print("line-for-both")
    tee.teardown_logging(b)
    print("line-for-a-again")
    tee.teardown_logging(a)
    print("line-for-nobody")
    log_a = open(a.path).read()
    log_b = open(b.path).read()
    assert "line-for-a" in log_a and "line-for-both" in log_a
    assert "line-for-a-again" in log_a          # outer keeps logging after inner restore
    assert "line-for-both" in log_b
    assert "line-for-a-again" not in log_b
    assert "line-for-nobody" not in log_a + log_b
