"""Device KMeans family: clustering quality + dynamic-k masking + streaming state."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mused_tpu.ops import kmeans


def make_blobs(rng, k, n_per, d=8, spread=0.05):
    centers = rng.normal(size=(k, d)) * 5
    pts = np.concatenate([c + rng.normal(size=(n_per, d)) * spread for c in centers])
    labels = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(len(pts))
    return pts[perm].astype(np.float32), labels[perm]


def purity(pred, truth):
    score = 0
    for c in np.unique(pred):
        members = truth[pred == c]
        score += np.bincount(members).max()
    return score / len(truth)


@pytest.mark.parametrize("k", [2, 4])
def test_kmeans_recovers_blobs(rng, k):
    x, truth = make_blobs(rng, k, 50)
    labels, cents = kmeans.kmeans(jnp.asarray(x), k, jax.random.key(0), k_max=8)
    labels = np.asarray(labels)
    assert labels.min() >= 0 and labels.max() < k  # dead centers never win
    assert purity(labels, truth) > 0.95


def test_kmeans_dynamic_k_single_compile(rng):
    """Different dynamic k values reuse one compiled executable (static k_max)."""
    x, _ = make_blobs(rng, 3, 30)
    f = kmeans.kmeans
    l2, _ = f(jnp.asarray(x), 2, jax.random.key(1), k_max=8)
    l3, _ = f(jnp.asarray(x), 3, jax.random.key(1), k_max=8)
    assert np.asarray(l2).max() < 2
    assert np.asarray(l3).max() < 3


def test_minibatch_streaming(rng):
    x, truth = make_blobs(rng, 3, 200)
    st = kmeans.minibatch_init(3, x.shape[1])
    all_labels = []
    for i, chunk in enumerate(np.array_split(x, 5)):
        st, labels = kmeans.minibatch_step(st, jnp.asarray(chunk), jax.random.key(i))
        all_labels.append(np.asarray(labels))
    pred = np.concatenate(all_labels)
    assert purity(pred, truth) > 0.9
    assert float(jnp.sum(st.counts)) == pytest.approx(len(x))


def test_empty_cluster_relocation(rng):
    """With k equal to the blob count but adversarial init collapse risk,
    every live cluster must end non-empty (sklearn relocates empties)."""
    x, truth = make_blobs(rng, 6, 40, spread=0.03)
    labels, cents = kmeans.kmeans(jnp.asarray(x), 6, jax.random.key(5), k_max=8)
    labels = np.asarray(labels)
    counts = np.bincount(labels, minlength=8)
    assert (counts[:6] > 0).all()
    assert purity(labels, truth) > 0.95


def test_kmeans_n_smaller_than_k_max(rng):
    """Regression (review finding): n < k_max (e.g. demo window=8 in 'all'
    label mode with k_max=150) must not crash the relocation top_k."""
    x = rng.normal(size=(8, 4)).astype(np.float32)
    labels, _ = kmeans.kmeans(jnp.asarray(x), 3, jax.random.key(0), k_max=150)
    labels = np.asarray(labels)
    assert labels.shape == (8,)
    assert labels.max() < 3
