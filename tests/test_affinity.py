"""Affinity kernels vs NumPy oracles of the reference semantics
(reference matrix_operations.py:14-132; conventions in SURVEY.md §2.4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mused_tpu.ops import affinity


def haversine_np(p, q):
    lat1, lon1, lat2, lon2 = map(np.radians, [p[0], p[1], q[0], q[1]])
    a = np.sin((lat2 - lat1) / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    return 2 * 6371 * np.arcsin(np.sqrt(a))


def check_knn_properties(adj, sim, valid, k):
    """Definition-level oracle: each valid row has exactly min(k, n_valid_other)
    edges, all to valid non-self columns, and selected sims dominate excluded
    sims (ties allowed either way)."""
    adj = np.asarray(adj)
    n = adj.shape[0]
    assert set(np.unique(adj)) <= {0.0, 1.0}
    assert np.all(np.diag(adj) == 0)
    for i in range(n):
        if not valid[i]:
            assert adj[i].sum() == 0
            continue
        cand = [j for j in range(n) if j != i and valid[j]]
        expect = min(k, len(cand))
        picked = np.flatnonzero(adj[i])
        assert len(picked) == expect, f"row {i}: {len(picked)} != {expect}"
        assert all(valid[j] for j in picked)
        if 0 < expect < len(cand):
            kth = sorted((sim[i, j] for j in cand), reverse=True)[expect - 1]
            assert all(sim[i, j] >= kth - 1e-6 for j in picked)
    # invalid columns receive no edges
    assert adj[:, ~np.asarray(valid)].sum() == 0


def test_location_adjacency(rng):
    n, k = 40, 5
    latlon = rng.uniform([-60, -170], [60, 170], size=(n, 2)).astype(np.float32)
    latlon[[3, 17]] = np.nan  # invalid rows (ref :25)
    adj = affinity.location_adjacency(jnp.asarray(latlon), k)
    valid = ~np.isnan(latlon).any(axis=1)
    sim = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            sim[i, j] = -haversine_np(latlon[i], latlon[j]) if valid[i] and valid[j] else -np.inf
    check_knn_properties(adj, sim, valid, k)


def test_time_adjacency(rng):
    n, kb = 30, 2
    t = rng.uniform(1e9, 1.1e9, size=(n, 2)).astype(np.float32)
    t[4] = 0.0  # invalid (ref :35)
    t[9, 1] = 0.0
    adj = affinity.time_adjacency(jnp.asarray(t), kb)
    valid = (t[:, 0] != 0) & (t[:, 1] != 0)
    sim = -(np.abs(t[:, :1] - t[:, :1].T) + np.abs(t[:, 1:] - t[:, 1:].T))
    check_knn_properties(adj, sim, valid, 3 * kb)


def test_username_adjacency():
    ids = np.array([0, 1, 0, -1, 1, 1], np.int32)
    adj = np.asarray(affinity.username_adjacency(jnp.asarray(ids)))
    expect = np.zeros((6, 6))
    expect[0, 2] = expect[2, 0] = 1
    for a in (1, 4, 5):
        for b in (1, 4, 5):
            if a != b:
                expect[a, b] = 1
    np.testing.assert_array_equal(adj, expect)


def test_jaccard_matrix_matches_sets(rng):
    n, h = 20, 64
    m = (rng.random((n, h)) < 0.1).astype(np.float32)
    jac = np.asarray(affinity.jaccard_matrix(jnp.asarray(m)))
    for i in range(n):
        for j in range(n):
            a, b = set(np.flatnonzero(m[i])), set(np.flatnonzero(m[j]))
            want = len(a & b) / len(a | b) if (a and b) else 0.0
            assert abs(jac[i, j] - want) < 1e-5


def test_tags_adjacency_properties(rng):
    n, h, k = 25, 64, 4
    m = (rng.random((n, h)) < 0.15).astype(np.float32)
    m[[2, 11]] = 0  # empty tag sets invalid (ref :79)
    adj = affinity.tags_adjacency(jnp.asarray(m), k)
    valid = m.sum(axis=1) > 0
    jac = np.asarray(affinity.jaccard_matrix(jnp.asarray(m)))
    check_knn_properties(adj, jac, valid, k)


def test_tfidf_cosine_matches_sklearn(rng):
    """Against sklearn's TfidfVectorizer math on an identity 'hash' (no
    collisions): our device TF-IDF must equal sklearn's cosine matrix."""
    from sklearn.feature_extraction.text import TfidfVectorizer
    from sklearn.metrics.pairwise import cosine_similarity
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 10))) for _ in range(15)]
    vec = TfidfVectorizer(vocabulary={w: i for i, w in enumerate(vocab)})
    want = cosine_similarity(vec.fit_transform(docs))
    counts = np.zeros((15, 30), np.float32)
    for i, dcc in enumerate(docs):
        for w in dcc.split():
            counts[i, int(w[1:])] += 1
    got = np.asarray(affinity.tfidf_cosine_matrix(jnp.asarray(counts)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_text_adjacency_properties(rng):
    n, h, k = 20, 128, 3
    counts = rng.poisson(0.08, size=(n, h)).astype(np.float32)
    counts[[0, 7]] = 0  # blank text invalid (ref :97)
    adj = affinity.text_adjacency(jnp.asarray(counts), k)
    valid = counts.sum(axis=1) > 0
    sim = np.asarray(affinity.tfidf_cosine_matrix(jnp.asarray(counts)))
    check_knn_properties(adj, sim, valid, k)


def test_euclidean_adjacency_properties(rng):
    n, kb = 30, 5
    x = rng.normal(size=(n, 8)).astype(np.float32)
    x[6] = np.inf
    adj = affinity.euclidean_adjacency(jnp.asarray(x), kb)
    valid = np.isfinite(x).all(axis=1)
    d = np.full((n, n), np.inf)
    for i in range(n):
        for j in range(n):
            if valid[i] and valid[j]:
                d[i, j] = np.sum((x[i] - x[j]) ** 2)
    # reference NearestNeighbors(k_basis) includes self => k_basis-1 real edges
    check_knn_properties(adj, -d, valid, kb - 1)


def test_fuse_is_logical_or(rng):
    a = (rng.random((10, 10)) < 0.2).astype(np.float32)
    b = (rng.random((10, 10)) < 0.2).astype(np.float32)
    fused = np.asarray(affinity.fuse([jnp.asarray(a), jnp.asarray(b)]))
    np.testing.assert_array_equal(fused, np.logical_or(a, b).astype(np.float32))


def test_multimodal_fused_jits(rng):
    n = 16
    latlon = rng.uniform(-50, 50, size=(n, 2)).astype(np.float32)
    times = rng.uniform(1, 2, size=(n, 2)).astype(np.float32)
    uids = rng.integers(-1, 4, size=n).astype(np.int32)
    tags = (rng.random((n, 32)) < 0.2).astype(np.float32)
    text = rng.poisson(0.2, size=(n, 64)).astype(np.float32)
    fused = affinity.multimodal_fused_adjacency(
        jnp.asarray(latlon), jnp.asarray(times), jnp.asarray(uids),
        jnp.asarray(tags), jnp.asarray(text), k_basis=3)
    fused = np.asarray(fused)
    assert fused.shape == (n, n)
    assert set(np.unique(fused)) <= {0.0, 1.0}
    assert np.all(np.diag(fused) == 0)
