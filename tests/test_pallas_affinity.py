"""Pallas fused affinity kernel vs the XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mused_tpu.ops import affinity
from mused_tpu.ops.pallas import affinity_kernel as pk


def xla_adjacency(sim, valid, k):
    return np.asarray(affinity.knn_adjacency(jnp.asarray(sim),
                                             jnp.asarray(valid), k))


@pytest.mark.parametrize("n,k", [(64, 5), (200, 9)])
def test_dot_metric_matches_xla(rng, n, k):
    x = rng.normal(size=(n, 48)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    valid = np.ones(n, bool)
    valid[[3, 11]] = False
    got = np.asarray(pk.knn_adjacency_pallas(jnp.asarray(x), jnp.asarray(valid),
                                             k, metric="dot"))
    sim = x @ x.T
    want = xla_adjacency(sim, valid, k)
    np.testing.assert_array_equal(got, want)


def test_euclidean_metric_matches_xla(rng):
    n, k = 96, 7
    x = rng.normal(size=(n, 16)).astype(np.float32)
    valid = np.ones(n, bool)
    got = np.asarray(pk.knn_adjacency_pallas(jnp.asarray(x), jnp.asarray(valid),
                                             k, metric="euclidean"))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    want = xla_adjacency(-d2, valid, k)
    np.testing.assert_array_equal(got, want)


def test_l1_time_metric_matches_xla(rng):
    n, kb = 80, 2
    t = rng.uniform(1e6, 2e6, size=(n, 2)).astype(np.float32)
    valid = (t[:, 0] != 0) & (t[:, 1] != 0)
    got = np.asarray(pk.knn_adjacency_pallas(jnp.asarray(t), jnp.asarray(valid),
                                             3 * kb, metric="l1"))
    want = np.asarray(affinity.time_adjacency(jnp.asarray(t), kb))
    np.testing.assert_array_equal(got, want)


def test_location_unit_xyz_ranking_matches_haversine(rng):
    """Dot-product kNN on 3D unit vectors == haversine kNN (monotone map)."""
    n, k = 72, 6
    latlon = rng.uniform([-80, -170], [80, 170], size=(n, 2)).astype(np.float32)
    valid = np.ones(n, bool)
    xyz = pk.location_to_unit_xyz(jnp.asarray(latlon))
    got = np.asarray(pk.knn_adjacency_pallas(xyz, jnp.asarray(valid), k,
                                             metric="dot"))
    want = np.asarray(affinity.location_adjacency(jnp.asarray(latlon), k))
    np.testing.assert_array_equal(got, want)


def test_fewer_valid_than_k(rng):
    n, k = 40, 10
    x = rng.normal(size=(n, 8)).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:6] = True     # only 5 valid neighbors per valid row
    got = np.asarray(pk.knn_adjacency_pallas(jnp.asarray(x), jnp.asarray(valid),
                                             k, metric="euclidean"))
    for i in range(n):
        assert got[i].sum() == (5 if valid[i] else 0)
    assert got[:, ~valid].sum() == 0


@pytest.mark.slow
def test_engine_pallas_path_runs():
    """use_pallas_affinity routes the generic engine through the fused kernel
    (interpret mode on CPU) and produces equivalent metrics."""
    import numpy as np
    from mused_tpu import api
    from mused_tpu.data.synthetic import crisis_embedding_stream
    from mused_tpu.utils.config import PipelineConfig
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=128, n_events=3, noise_rate=0.2, d_text=32, d_image=32, seed=3)
    out = {}
    for flag in (False, True):
        cfg = PipelineConfig(window_size=64, reduced_dim=8, k_basis=4,
                             approach="sSpectral", label_mode="all",
                             n_clusters_override=4, use_pallas_affinity=flag,
                             eps=1.5, min_samples=2)
        results, _ = api.get_initial_results()
        results = api.process_streaming_data(
            results=results, data_modalities=mods, modality_types=mtypes,
            window_size=64, reduced_dim=8, k_basis=4, n_clusters_total=4,
            seed=0, approach="sSpectral", complete_true_labels=labels,
            step_window_ratio=1, noise_rate=0.2, label_mode="all",
            sorting=False, eps=1.5, min_samples=2, cfg=cfg)
        out[flag] = results["nmi_score"][0]
    assert abs(out[True] - out[False]) < 0.2


def test_time_metric_nan_padded_rows(rng):
    """Regression (VERDICT r1 weak #3): NaN-padded rows (the blocked/batch
    padding convention) must be invalid under the Pallas time path exactly as
    under the XLA path — and must not poison the in-kernel bisection."""
    from mused_tpu.engine.streaming import _fuse_generic
    n = 64
    m = np.abs(rng.normal(size=(n, 2))).astype(np.float32) + 0.1
    m[50:] = np.nan          # padding rows
    m[7] = 0.0               # reference zero-timestamp invalid row
    got = np.asarray(_fuse_generic((jnp.asarray(m),), k_basis=2,
                                   types=("time",), use_pallas=True))
    want = np.asarray(_fuse_generic((jnp.asarray(m),), k_basis=2,
                                    types=("time",), use_pallas=False))
    assert np.all(np.isfinite(got))
    assert got[50:].sum() == 0 and got[:, 50:].sum() == 0
    np.testing.assert_array_equal(got, want)


def test_jaccard_metric_matches_xla(rng):
    """In-kernel Jaccard (tags modality) agrees with the XLA tags path,
    including the valid-but-empty-set quirk rows."""
    n, k = 128, 4
    multihot = (rng.random((n, 64)) < 0.08).astype(np.float32)
    multihot[5] = 0.0        # empty set, still a valid participant
    valid = np.ones(n, bool)
    valid[17] = False        # raw-cell-empty row
    got = np.asarray(pk.knn_adjacency_pallas(
        jnp.asarray(multihot), jnp.asarray(valid), k, metric="jaccard"))
    want = np.asarray(affinity.tags_adjacency(jnp.asarray(multihot), k,
                                              jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)


def test_standard_pallas_fusion_matches_xla(rng):
    """The full 5-modality Pallas fusion reproduces the XLA fused adjacency
    on featurized data (interpret mode; f32 inputs => exact rankings)."""
    from mused_tpu.data.synthetic import synthetic_events_dataframe
    from mused_tpu.data.sed2012 import prepare_modalities
    from mused_tpu.data import features as feat
    from mused_tpu.engine.streaming import (_fuse_standard_pallas,
                                            _fuse_standard_sparse)
    from mused_tpu.utils.config import FeatureConfig
    df = synthetic_events_dataframe(n_rows=300, n_events=3, noise_rate=0.5,
                                    seed=1)
    mods, _, _ = prepare_modalities(df, subset_size=128, binary=True,
                                    sort_by_uploaded=True, noise_rate=0.4,
                                    seed=1)
    fc = FeatureConfig()
    wf = feat.featurize_window(*mods, fc)
    kw = dict(k_basis=3, tags_dim=fc.tags_hash_dim, text_dim=fc.text_hash_dim)
    want = np.asarray(_fuse_standard_sparse(
        wf.location, wf.times, wf.user_ids, wf.tags_ids, wf.text_ids,
        wf.text_cnt, wf.tags_valid, **kw))
    got = np.asarray(_fuse_standard_pallas(
        jnp.asarray(wf.location), jnp.asarray(wf.times),
        jnp.asarray(wf.user_ids), jnp.asarray(wf.tags_ids),
        jnp.asarray(wf.text_ids), jnp.asarray(wf.text_cnt),
        jnp.asarray(wf.tags_valid), sparse=True, **kw))
    # haversine-vs-unit-xyz and threshold-tie semantics can differ on exact
    # ties only; require near-total agreement and identical edge counts/row
    assert (got != want).mean() < 0.002, (got != want).sum()
    np.testing.assert_allclose(got.sum(axis=1), want.sum(axis=1), atol=2)


def test_bfloat16_inputs_jaccard_exact(rng):
    """bf16 MXU operands are exact for 0/1 multi-hot Jaccard."""
    n, k = 96, 3
    multihot = (rng.random((n, 128)) < 0.1).astype(np.float32)
    valid = np.ones(n, bool)
    a = np.asarray(pk.knn_adjacency_pallas(jnp.asarray(multihot),
                                           jnp.asarray(valid), k,
                                           metric="jaccard",
                                           input_dtype="bfloat16"))
    b = np.asarray(pk.knn_adjacency_pallas(jnp.asarray(multihot),
                                           jnp.asarray(valid), k,
                                           metric="jaccard"))
    np.testing.assert_array_equal(a, b)


def test_jaccard_duplicate_sets_large_n(rng):
    """Regression (r2 review): duplicate tag sets tie at Jaccard 1.0; at
    n >= ~500 an additive index jitter is below ulp(1.0) and cannot separate
    them — the in-kernel integer tie bisection must keep exactly k edges per
    row, matching lax.top_k, even at production n."""
    n, k = 1024, 3
    base = (rng.random((8, 64)) < 0.15).astype(np.float32)
    idx = rng.integers(0, 8, size=n)
    multihot = base[idx]                  # hundreds of identical rows
    valid = np.ones(n, bool)
    got = np.asarray(pk.knn_adjacency_pallas(
        jnp.asarray(multihot), jnp.asarray(valid), k, metric="jaccard"))
    want = np.asarray(affinity.tags_adjacency(jnp.asarray(multihot), k,
                                              jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)
    assert (got.sum(axis=1) == k).all()


def test_duplicate_features_emit_exactly_k(rng):
    """Round-5 tie budget for every metric: 40 rows sharing one geotag
    previously blew the threshold rule up to degree 44 at k=5 (all exact
    ties passed).  Duplicates must emit exactly k edges per row, matching
    lax.top_k's lowest-index tie rule."""
    n, k = 64, 5
    x = rng.normal(size=(n, 8)).astype(np.float32)
    x[10:50] = x[10]                      # 40 exact duplicates
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    valid = np.ones(n, bool)
    got = np.asarray(pk.knn_adjacency_pallas(jnp.asarray(x),
                                             jnp.asarray(valid), k,
                                             metric="dot"))
    assert got.sum(axis=1).max() == k
    want = xla_adjacency(x @ x.T, valid, k)
    np.testing.assert_array_equal(got, want)


def test_chord3_city_scale_resolution(rng):
    """Round-5 location metric: at ~200 m spacing the f32 unit-xyz dot
    saturates at exactly 1.0 (5 distinct values among 20 points measured),
    while chord3's explicit differences keep the haversine ranking."""
    lat0, lon0 = 41.39, 2.16              # Barcelona
    step = 0.0018                          # ~200 m
    latlon = np.array([[lat0 + i * step, lon0] for i in range(20)],
                      np.float32)
    k = 4
    valid = np.ones(20, bool)
    xyz = pk.location_to_unit_xyz(jnp.asarray(latlon))
    got = np.asarray(pk.knn_adjacency_pallas(xyz, jnp.asarray(valid), k,
                                             metric="chord3"))
    # haversine oracle
    hav = np.asarray(affinity.location_adjacency(jnp.asarray(latlon), k))
    np.testing.assert_array_equal(got, hav > 0)
