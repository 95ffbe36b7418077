"""Vectorized synthetic-events generator: schema + distribution parity.

The loop generator (the seeded fixture source for every small test
stream) is ~1 ms/row — host-bound at the huge-window/1M-stream scales
BENCH_DETAIL runs at — so large n auto-routes to the vectorized path.
These tests pin that the two paths agree on everything the pipeline
consumes: schema, dtypes, label structure, per-event geography/timing,
and the invalidity sprinkle rates.  (Rows are NOT bitwise equal across
paths by design — RNG consumption order differs.)
"""
import numpy as np
import pandas as pd

from mused_tpu.data.synthetic import synthetic_events_dataframe
import pytest


def _pair(n=4000, **kw):
    a = synthetic_events_dataframe(n_rows=n, fast=False, **kw)
    b = synthetic_events_dataframe(n_rows=n, fast=True, **kw)
    return a, b


def test_fast_schema_matches_loop():
    a, b = _pair(n=500, n_events=5, noise_rate=0.4, seed=3)
    assert list(a.columns) == list(b.columns)
    assert len(b) == 500
    for c in ("id", "datetaken", "dateupload", "latitude", "longitude",
              "event_id", "is_event", "event_type"):
        assert a[c].dtype == b[c].dtype, c
    assert all(isinstance(t, list) for t in b["tags"])
    assert all(isinstance(s, str) for s in b["title"])


def test_fast_label_structure():
    _, b = _pair(n=3000, n_events=6, noise_rate=0.4, seed=0)
    eid = b["event_id"].to_numpy()
    assert set(np.unique(eid)) == set(range(7))
    assert (b["is_event"].to_numpy() == (eid > 0)).all()
    np.testing.assert_array_equal(
        b["event_type"].to_numpy(), np.where(eid == 0, 0, (eid - 1) % 3 + 1))
    # noise share matches the request (int truncation exact)
    assert (eid == 0).sum() == int(3000 * 0.4)


def test_fast_event_geography_and_timing_match_loop():
    a, b = _pair(n=4000, n_events=6, noise_rate=0.4, seed=0)

    def event_stats(df):
        g = df[df.event_id > 0].groupby("event_id")
        return g[["latitude", "longitude"]].mean(), g["datetaken"].median()

    # per-event homes are the same deterministic default_rng(1000+ev)
    # values in both paths; means agree to the 0.05-sigma jitter
    home_a, t_a = event_stats(a)
    home_b, t_b = event_stats(b)
    assert np.nanmax(np.abs(home_b.values - home_a.values)) < 0.05
    assert np.max(np.abs((t_b - t_a).values)) < 4000.0


@pytest.mark.slow
def test_fast_invalidity_rates():
    _, b = _pair(n=20000, n_events=6, noise_rate=0.4, seed=1)
    assert abs(b["latitude"].isna().mean() - 0.10) < 0.02
    assert abs((b["datetaken"] == 0).mean() - 0.05) < 0.015


def test_auto_threshold_routing(monkeypatch):
    """fast=None routes n_rows >= 20k to the vectorized generator (the
    threshold has been part of the data contract since commit 872169a);
    assert the routing itself, not wall clock."""
    from mused_tpu.data import synthetic as syn
    calls = []

    def spy(n_rows, n_events, noise_rate, seed):
        calls.append(n_rows)
        return syn.synthetic_events_dataframe(
            min(n_rows, 50), n_events, noise_rate, seed, fast=False)

    monkeypatch.setattr(syn, "_synthetic_events_fast", spy)
    syn.synthetic_events_dataframe(n_rows=500, n_events=3, noise_rate=0.5,
                                   seed=0)   # small: loop path, no spy
    assert calls == []
    syn.synthetic_events_dataframe(n_rows=20_000, n_events=3, noise_rate=0.5,
                                   seed=0)   # at the threshold: fast path
    assert calls == [20_000]


def test_fast_feeds_pipeline():
    # the featurizer consumes the fast path's columns end-to-end
    from mused_tpu.data.sed2012 import prepare_modalities
    df = synthetic_events_dataframe(n_rows=600, n_events=4, noise_rate=0.5,
                                    seed=0, fast=True)
    mods, mtypes, labels = prepare_modalities(
        df, subset_size=512, binary=True, sort_by_uploaded=False,
        noise_rate=0.5, seed=0)
    assert len(mods[0]) == 512 and len(labels) == 512
