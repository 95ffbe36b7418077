"""Randomized truncated SVD vs exact SVD (subspace/spectrum-level parity —
sign/rotation ambiguity makes elementwise comparison meaningless, SURVEY.md §7.3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mused_tpu.ops import reduction


def decaying(rng, n, d, power=1.0):
    """Matrix with a polynomially decaying spectrum (adjacency-like regime —
    flat-spectrum Gaussians are the known worst case for any randomized SVD)."""
    u, _ = np.linalg.qr(rng.normal(size=(n, min(n, d))))
    v, _ = np.linalg.qr(rng.normal(size=(d, min(n, d))))
    s = (np.arange(1, min(n, d) + 1, dtype=np.float64)) ** (-power) * 20
    return (u * s[None, :]) @ v.T


def test_spectrum_matches_exact(rng):
    x = decaying(rng, 120, 80).astype(np.float32)
    u, s, vt = reduction.randomized_svd(jnp.asarray(x), 10, jax.random.key(0))
    s_exact = np.linalg.svd(x, compute_uv=False)[:10]
    np.testing.assert_allclose(np.asarray(s), s_exact, rtol=1e-3)


def test_low_rank_reconstruction(rng):
    base = rng.normal(size=(6, 64)).astype(np.float32)
    x = (rng.normal(size=(100, 6)).astype(np.float32) @ base)
    u, s, vt = reduction.randomized_svd(jnp.asarray(x), 6, jax.random.key(1))
    recon = np.asarray(u * s[None, :]) @ np.asarray(vt)
    np.testing.assert_allclose(recon, x, atol=1e-2 * np.abs(x).max())


def test_svd_reduce_matches_sklearn_geometry(rng):
    """fit_transform outputs agree with sklearn up to orthogonal transform:
    compare pairwise distance matrices of the embeddings."""
    from sklearn.decomposition import TruncatedSVD
    x = decaying(rng, 60, 40).astype(np.float32)
    ours = np.asarray(reduction.svd_reduce(jnp.asarray(x), 5, jax.random.key(2)))
    skl = TruncatedSVD(n_components=5, random_state=0).fit_transform(x)
    def pdist(a):
        return np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1)
    np.testing.assert_allclose(pdist(ours), pdist(skl), rtol=2e-2, atol=2e-2)


def test_svd_reduce_dim_clamp(rng):
    """reduced_dim > d-1 clamps like the reference (matrix_operations.py:145)
    but pads the output back to a static width."""
    x = rng.normal(size=(20, 4)).astype(np.float32)
    out = np.asarray(reduction.svd_reduce(jnp.asarray(x), 8, jax.random.key(0)))
    assert out.shape == (20, 8)
    assert np.all(out[:, 3:] == 0)  # only min(8, 4-1)=3 live components


def test_eigengap_k_recovers_cluster_count(rng):
    """eigengap_k finds the block count of a clustered adjacency spectrum
    (the unsupervised replacement for the reference's ground-truth-derived
    per-window k, main.py:41)."""
    for c in (2, 3, 5, 7):
        labels = rng.integers(0, c, 240)
        a = (labels[:, None] == labels[None, :]).astype(np.float32)
        a *= (rng.random((240, 240)) < 0.3)       # sparsify like a kNN graph
        red = reduction.svd_reduce(jnp.asarray(a), 16, jax.random.key(0))
        assert int(reduction.eigengap_k(red, k_max=10)) == c


def test_eigengap_k_respects_bounds(rng):
    x = jnp.asarray(rng.normal(size=(40, 12)).astype(np.float32))
    k = int(reduction.eigengap_k(x, k_max=4))
    assert 1 <= k <= 4
    assert int(reduction.eigengap_k(x, k_max=4, k_min=3)) >= 3


def test_eigengap_k_ignores_rank_cutoff(rng):
    """Exact-zero trailing energies (svd_reduce zero-pads past rank; FD
    zeroes trailing sketch rows) must not capture the gap: the relative gap
    at the rank cutoff is exactly 1.0 and would otherwise always win."""
    # 3 dominant directions, a weak tail, then exact-zero columns
    e = np.array([100.0, 98.0, 95.0, 5, 4, 3, 2, 1] + [0.0] * 24, np.float32)
    reduced = jnp.asarray(np.diag(np.sqrt(e)))       # column energies == e
    assert int(reduction.eigengap_k(reduced, k_max=30)) == 3


def test_eigengap_k_perron_inflated_leader():
    """A noise-inflated leading (Perron/degree) energy must not hijack the
    count when a strong structural gap exists later.  Profile shaped like a
    measured planted-6-event window at noise 0.65 (plus the noise class —
    7 structural directions): before the strong-secondary-gap rule the
    estimator answered k=1 there (the e1/e2 ratio beats every real gap)."""
    e = np.array([2231.0, 1059, 975, 924, 891, 862, 759]
                 + list(np.linspace(558, 300, 13)), np.float32)
    reduced = jnp.asarray(np.diag(np.sqrt(e)))
    assert int(reduction.eigengap_k(reduced, k_max=19)) == 7


def test_eigengap_k_structureless_stays_one():
    """With no strong secondary gap anywhere (structureless window: smooth
    tail decay after the Perron direction) the i=1 gap stands and the
    estimate stays 1."""
    e = np.array([2680.0, 708, 624, 586, 553, 531, 515, 467, 448, 424]
                 + list(np.linspace(410, 300, 11)), np.float32)
    reduced = jnp.asarray(np.diag(np.sqrt(e)))
    assert int(reduction.eigengap_k(reduced, k_max=20)) == 1


def test_svd_reduce_static_shape_small_windows(rng):
    """The static-shape contract must hold even when the window has fewer
    rows than the clamped rank (review r5: (5, 200) came back (5, 5))."""
    import jax
    from mused_tpu.ops.reduction import svd_reduce
    for n, d, r in ((5, 200, 64), (5, 40, 30), (3, 8, 16)):
        out = svd_reduce(jnp.asarray(rng.normal(size=(n, d)),
                                     jnp.float32), r, jax.random.key(0))
        assert out.shape == (n, r), (n, d, r, out.shape)


def test_eigengap_ignores_rank_cutoff_artifact():
    """A gap INTO the numerically-zero padding tail is the rank-cutoff
    artifact, masked regardless of leading energy (review r5: energies
    [100,60,55,20,18,16,0,...] answered k=6 against the true gap at 3)."""
    from mused_tpu.ops.reduction import eigengap_k
    e = np.array([100.0, 60.0, 55.0, 20.0, 18.0, 16.0, 0.0, 0.0])
    reduced = jnp.asarray(np.sqrt(e)[None, :] * np.ones((4, 1), np.float32))
    # column energies of `reduced` are 4*e — same profile
    assert int(eigengap_k(reduced, k_max=7)) == 3
