"""Rematerialized blocked batch path vs the dense path (exactness + scale guard)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mused_tpu import api
from mused_tpu.data.synthetic import synthetic_events_dataframe, crisis_embedding_stream
from mused_tpu.data.sed2012 import prepare_modalities
from mused_tpu.ops import blocked_affinity as ba
from mused_tpu.data import features as feat
from mused_tpu.utils.config import FeatureConfig, PipelineConfig


@pytest.fixture(scope="module")
def stream():
    df = synthetic_events_dataframe(n_rows=420, n_events=4, noise_rate=0.5, seed=0)
    return prepare_modalities(df, subset_size=256, sort_by_uploaded=True,
                              binary=True, noise_rate=0.5, seed=0)


@pytest.mark.slow
def test_fused_rowblock_matches_dense(stream):
    """Rematerialized row blocks must reproduce the dense fused adjacency.

    The blocked path ranks location by the (haversine-rank-equivalent)
    unit-xyz chord distance and computes the text dot on bf16-rounded
    vectors (exact products, f32 accumulation), so a borderline kNN tie
    can legitimately flip vs the dense engine's f32 haversine/cosine —
    the agreement requirement is near-total, not bitwise."""
    from mused_tpu.engine.streaming import StreamingEngine
    mods, mtypes, _ = stream
    n, block = 256, 64
    cfg = PipelineConfig(window_size=n, k_basis=3)
    dense = np.asarray(StreamingEngine(cfg).fused_adjacency(mods, mtypes))

    loc, tim, user, tags, text = mods
    wf = feat.featurize_window(loc, tim, user, tags, text, FeatureConfig())
    cols = ba.standard_columns(wf)
    diff = 0
    for start in range(0, n, block):
        blk = np.asarray(ba.fused_rowblock(cols, jnp.int32(start), block, 3))
        diff += int(np.sum(blk != dense[start:start + block]))
    assert diff <= 0.005 * dense.sum(), \
        f"{diff} differing edges vs {int(dense.sum())} total"


def test_blocked_svd_matches_exact_svd_quality(stream):
    """Blocked randomized SVD of the implicit adjacency captures (nearly) the
    optimal rank-r energy of the exact dense SVD.  (Two randomized runs can
    legitimately pick different subspaces when the spectrum is flat at the
    cutoff, so the comparison is against the optimum, not another sample.)"""
    from mused_tpu.engine.streaming import StreamingEngine
    mods, mtypes, _ = stream
    cfg = PipelineConfig(window_size=256, k_basis=3)
    dense = np.asarray(StreamingEngine(cfg).fused_adjacency(mods, mtypes),
                       dtype=np.float64)
    s_exact = np.linalg.svd(dense, compute_uv=False)

    loc, tim, user, tags, text = mods
    wf = feat.featurize_window(loc, tim, user, tags, text, FeatureConfig())
    cols = ba.standard_columns(wf)
    got = np.asarray(ba.blocked_svd_reduce(cols, jax.random.key(0), rank=8,
                                           block=64, k_basis=3))
    # captured energy: sum of squared embedding norms == sum of sigma_i^2 kept
    captured = float(np.sum(got ** 2))
    optimal = float(np.sum(s_exact[:8] ** 2))
    assert captured >= 0.97 * optimal
    assert captured <= 1.01 * optimal
    # leading singular values recovered accurately
    s_blocked = np.linalg.norm(got, axis=0)
    np.testing.assert_allclose(sorted(s_blocked)[::-1][:4], s_exact[:4],
                               rtol=0.02)


def test_batch_engine_blocked_path(stream):
    """SVDMC_batch through the blocked path (forced) matches the dense path's
    quality on the same subset."""
    mods, mtypes, labels = stream
    out = {}
    for forced in (False, True):
        cfg = PipelineConfig(window_size=64, reduced_dim=8, k_basis=3,
                             approach="SVDMC_batch", label_mode="binary",
                             force_blocked_batch=forced)
        results, _ = api.get_initial_results()
        results = api.process_batch_data(
            results=results, data_modalities=mods, modality_types=mtypes,
            reduced_dim=8, k_basis=3, n_clusters=2, seed=0,
            approach="SVDMC_batch", complete_true_labels=labels,
            noise_rate=0.5, label_mode="binary", sorting=True, eps=1.5,
            min_samples=2, min_cluster_size=3, window_size=64, cfg=cfg)
        out[forced] = results["nmi_score"][0]
    assert abs(out[True] - out[False]) < 0.15


def test_blocked_path_with_padding():
    """n not divisible by the block: padding rows are invalid and sliced off."""
    mods, mtypes, labels = crisis_embedding_stream(
        n_rows=200, n_events=3, noise_rate=0.2, d_text=32, d_image=32, seed=4)
    cfg = PipelineConfig(window_size=64, reduced_dim=8, k_basis=4,
                         approach="SVDMC_batch", label_mode="all",
                         n_clusters_override=4, force_blocked_batch=True)
    results, _ = api.get_initial_results()
    results = api.process_batch_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        reduced_dim=8, k_basis=4, n_clusters=4, seed=0,
        approach="SVDMC_batch", complete_true_labels=labels, noise_rate=0.2,
        label_mode="all", sorting=False, eps=1.5, min_samples=2,
        min_cluster_size=3, window_size=64, cfg=cfg)
    assert results["nmi_score"][0] > 0.4


@pytest.mark.slow
def test_no_batch_approach_is_capped(stream):
    """Every batch approach now has a beyond-dense-cap path (blocked SVD /
    DBSCAN / HDBSCAN / spectral) — the forced-blocked route must succeed for
    all of them."""
    mods, mtypes, labels = stream
    for approach in ("SVDMC_batch", "DBSCAN_batch", "HDBSCAN_batch",
                     "Spectral_batch"):
        cfg = PipelineConfig(approach=approach, force_blocked_batch=True,
                             reduced_dim=8, k_basis=3)
        results = api.process_batch_data(
            results=api.get_initial_results()[0], data_modalities=mods,
            modality_types=mtypes, reduced_dim=8, k_basis=3, n_clusters=2,
            seed=0, approach=approach, complete_true_labels=labels,
            noise_rate=0.5, label_mode="binary", sorting=True, eps=1.5,
            min_samples=2, min_cluster_size=3, window_size=64, cfg=cfg)
        assert len(results["f1_score"]) == 1, approach


@pytest.mark.parametrize("approach", ["SWFDMC", "sSVDMC"])
@pytest.mark.slow
def test_huge_window_streaming_path(stream, approach):
    """The rematerialized huge-window streaming path (forced at small scale)
    matches the dense path's quality (BASELINE.md config #3 regime)."""
    mods, mtypes, labels = stream
    out = {}
    for forced in (False, True):
        cfg = PipelineConfig(window_size=64, reduced_dim=8, k_basis=3,
                             approach=approach, label_mode="binary",
                             n_clusters_override=2,
                             force_blocked_window=forced)
        results, _ = api.get_initial_results()
        results = api.process_streaming_data(
            results=results, data_modalities=mods, modality_types=mtypes,
            window_size=64, reduced_dim=8, k_basis=3, n_clusters_total=2,
            seed=0, approach=approach, complete_true_labels=labels,
            step_window_ratio=1, noise_rate=0.5, label_mode="binary",
            sorting=True, eps=1.5, min_samples=2, cfg=cfg)
        out[forced] = results["nmi_score"][0]
    assert abs(out[True] - out[False]) < 0.2


@pytest.mark.parametrize("approach", ["sSpectral", "DBSCAN_centr"])
@pytest.mark.slow
def test_huge_window_density_and_spectral(stream, approach):
    """sSpectral and DBSCAN_centr also run on the forced huge-window path
    (blocked spectral / blocked DBSCAN kernels)."""
    mods, mtypes, labels = stream
    cfg = PipelineConfig(window_size=64, reduced_dim=8, k_basis=3,
                         approach=approach, label_mode="binary",
                         n_clusters_override=2, force_blocked_window=True,
                         eps=1.0, min_samples=2)
    results, _ = api.get_initial_results()
    results = api.process_streaming_data(
        results=results, data_modalities=mods, modality_types=mtypes,
        window_size=64, reduced_dim=8, k_basis=3, n_clusters_total=2,
        seed=0, approach=approach, complete_true_labels=labels,
        step_window_ratio=1, noise_rate=0.5, label_mode="binary",
        sorting=True, eps=1.0, min_samples=2, cfg=cfg)
    assert len(results["f1_score"]) == 1


@pytest.mark.slow
def test_standard_columns_honors_nondefault_hash_dims(stream):
    """Regression (ADVICE r1): standard_columns must size the sparse->dense
    scatter from the pipeline's FeatureConfig, not a default one — ids hashed
    modulo a larger dim would be silently dropped by out-of-bounds scatter."""
    from mused_tpu.engine.streaming import StreamingEngine
    mods, mtypes, _ = stream
    fc = FeatureConfig(tags_hash_dim=4096, text_hash_dim=8192)
    cfg = PipelineConfig(window_size=256, k_basis=3, features=fc)
    dense = np.asarray(StreamingEngine(cfg).fused_adjacency(mods, mtypes))

    loc, tim, user, tags, text = mods
    wf = feat.featurize_window(loc, tim, user, tags, text, fc)
    cols = ba.standard_columns(wf, fc)
    assert cols.tensors[3][0].shape[1] == 4096   # (multi_hot, row sums)
    # text is stored as ONE bf16 tensor at the configured hash dim
    assert cols.tensors[4].shape[1] == 8192
    assert cols.tensors[4].dtype == jnp.bfloat16
    blk = np.asarray(ba.fused_rowblock(cols, jnp.int32(0), 256, 3))
    diff = int(np.sum(blk != dense))
    assert diff <= 0.005 * dense.sum(), \
        f"{diff} differing edges vs {int(dense.sum())} total"


def test_blocked_fd_sketch_rejects_nondividing_block(stream):
    """Regression (ADVICE r1): the FD fold over clamped last-block overlap
    rows would silently absorb them twice — reject instead."""
    mods, _, _ = stream
    loc, tim, user, tags, text = mods
    wf = feat.featurize_window(loc, tim, user, tags, text, FeatureConfig())
    cols = ba.standard_columns(wf)
    with pytest.raises(AssertionError):
        ba.blocked_fd_sketch(cols, ell=8, block=100, k_basis=3)


def test_text_split_dot_matches_f32(rng):
    """The bf16 [hi|lo] pre-split text dot (three half-width dots) must
    reproduce the f32 dot to ~HIGH accuracy — a single dot of the packed
    tensor with itself loses the cross terms and regresses to plain-bf16
    error (~6e-4), which flips real text kNN edges (regression for exactly
    that bug)."""
    x = rng.normal(size=(64, 128)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    hi = jnp.asarray(x).astype(jnp.bfloat16)
    lo = (jnp.asarray(x) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sim = (jnp.dot(hi, hi.T, preferred_element_type=jnp.float32)
           + jnp.dot(hi, lo.T, preferred_element_type=jnp.float32)
           + jnp.dot(lo, hi.T, preferred_element_type=jnp.float32))
    exact = x @ x.T
    assert np.max(np.abs(np.asarray(sim) - exact)) < 5e-6
