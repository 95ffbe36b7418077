"""Native C++ hasher: bitwise parity with the Python fallback + speed."""
import time

import numpy as np
import pytest

from mused_tpu import native
from mused_tpu.data import features as feat


def python_text_counts(texts, dim):
    """The pure-Python reference implementation (bypasses the native path)."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, text in enumerate(texts):
        if not isinstance(text, str) or not text:
            continue
        for tok in feat._TOKEN_RE.findall(text.lower()):
            if len(tok) >= 2:
                out[i, feat.stable_hash(tok) % dim] += 1.0
    return out


def python_multihot(tag_lists, dim):
    out = np.zeros((len(tag_lists), dim), np.float32)
    for i, tags in enumerate(tag_lists):
        if tags is None:
            continue
        if isinstance(tags, str):
            tags = [tags] if tags else []
        for t in tags:
            if t:
                out[i, feat.stable_hash(str(t)) % dim] = 1.0
    return out


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_text_counts_bitwise_parity(rng):
    words = ["festival", "goal", "x", "ab", "protesting", "summer2012",
             "a" * 300]  # incl. 1-char (dropped) and very long tokens
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 12)))
             for _ in range(200)]
    texts += ["", "UPPER Case MiXeD", "punct!@#,separated..tokens"]
    fast = native.hash_text_counts(texts, 512)
    slow = python_text_counts(texts, 512)
    np.testing.assert_array_equal(fast, slow)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_multihot_tags_bitwise_parity(rng):
    vocab = [f"tag{i}" for i in range(60)] + ["日本語タグ", "emoji🎉"]
    tag_lists = [list(rng.choice(vocab, size=rng.integers(0, 6),
                                 replace=False)) for _ in range(150)]
    tag_lists += [[], None, ["solo"]]
    fast = native.multihot_tags(tag_lists, 256)
    slow = python_multihot(tag_lists, 256)
    np.testing.assert_array_equal(fast, slow)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_is_faster(rng):
    words = [f"word{i}" for i in range(500)]
    texts = [" ".join(rng.choice(words, size=40)) for _ in range(2000)]

    def med(f):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    fast_t = med(lambda: native.hash_text_counts(texts, 4096))
    slow_t = med(lambda: python_text_counts(texts, 4096))
    assert fast_t < slow_t, f"native {fast_t:.3f}s not faster than python {slow_t:.3f}s"


def test_featurize_window_uses_some_path(rng):
    """featurize_window works whether or not the native library is present."""
    n = 16
    loc = rng.normal(size=(n, 2))
    times = rng.normal(size=(n, 2))
    users = np.array([["u%d" % (i % 3)] for i in range(n)], object)
    tags = np.array([[["a", "b"]] for _ in range(n)], object)
    texts = np.array([["hello world", "more text"] for _ in range(n)], object)
    from mused_tpu.utils.config import FeatureConfig
    wf = feat.featurize_window(loc, times, users, tags, texts, FeatureConfig())
    assert (wf.text_ids >= 0).sum() > 0 and (wf.tags_ids >= 0).sum() > 0
    dense = feat.featurize_window(loc, times, users, tags, texts,
                                  FeatureConfig(sparse=False))
    assert dense.text.sum() > 0 and dense.tags.sum() > 0


def test_sparse_reconstructs_dense(rng):
    """counts_from_tokens(sparse featurization) must equal the dense
    featurizer's tensors exactly (both native and python paths)."""
    import jax.numpy as jnp
    from mused_tpu.ops.affinity import counts_from_tokens
    from mused_tpu.utils.config import FeatureConfig
    words = ["festival", "goal", "ab", "protesting", "summer2012", "x"]
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 14)))
             for _ in range(80)] + ["", "REPEAT repeat RePeAt"]
    tag_lists = [list(rng.choice([f"t{i}" for i in range(30)],
                                 size=rng.integers(0, 5), replace=False))
                 for _ in range(82)]
    fc = FeatureConfig()
    dense_text = python_text_counts(texts, fc.text_hash_dim)
    dense_tags = np.zeros((82, fc.tags_hash_dim), np.float32)
    for i, tl in enumerate(tag_lists):
        for t in tl:
            dense_tags[i, feat.stable_hash(t) % fc.tags_hash_dim] = 1.0

    for use_native in ([True, False] if native.available() else [False]):
        if use_native:
            ids, cnt = native.hash_text_sparse(texts, fc.text_hash_dim,
                                               fc.text_token_cap)
            tids = native.multihot_tags_sparse(tag_lists, fc.tags_hash_dim,
                                               fc.tags_token_cap)
        else:
            ids, cnt = feat.hash_text_sparse_py(texts, fc.text_hash_dim,
                                                fc.text_token_cap)
            tids = feat.multihot_tags_sparse_py(tag_lists, fc.tags_hash_dim,
                                                fc.tags_token_cap)
        got_text = np.asarray(counts_from_tokens(jnp.asarray(ids),
                                                 jnp.asarray(cnt),
                                                 fc.text_hash_dim))
        got_tags = np.asarray(counts_from_tokens(jnp.asarray(tids), None,
                                                 fc.tags_hash_dim))
        np.testing.assert_array_equal(got_text, dense_text,
                                      err_msg=f"use_native={use_native}")
        np.testing.assert_array_equal(got_tags, dense_tags,
                                      err_msg=f"use_native={use_native}")


def test_sparse_native_matches_python(rng):
    if not native.available():
        pytest.skip("no C++ toolchain")
    texts = ["many many tokens here repeated here many", "", "ab cd ab"]
    n_ids, n_cnt = native.hash_text_sparse(texts, 512, 16)
    p_ids, p_cnt = feat.hash_text_sparse_py(texts, 512, 16)
    np.testing.assert_array_equal(n_ids, p_ids)
    np.testing.assert_array_equal(n_cnt, p_cnt)


def test_trim_token_cols_preserves_scatter():
    """trim_token_cols slices only all-padding columns: the dense scatter of
    trimmed and untrimmed sparse features is identical, and the trimmed
    width tracks the window's max occupancy (multiple of 8)."""
    import jax.numpy as jnp
    from mused_tpu.data import features as feat
    from mused_tpu.ops import affinity
    from mused_tpu.utils.config import FeatureConfig

    n = 32
    rng = np.random.default_rng(0)
    loc = rng.uniform(-10, 10, size=(n, 2))
    times = np.stack([rng.uniform(1e9, 1.1e9, n)] * 2, axis=1)
    users = np.array([[f"u{i % 5}"] for i in range(n)], object)
    tags = np.array([[["a", "b", f"t{i % 3}"]] for i in range(n)], object)
    texts = np.array([[f"short text {i % 4} words here", "desc"]
                      for i in range(n)], object)

    base = dict(tags_hash_dim=64, text_hash_dim=128, sparse=True)
    trimmed = feat.featurize_window(loc, times, users, tags, texts,
                                    FeatureConfig(**base))
    full = feat.featurize_window(loc, times, users, tags, texts,
                                 FeatureConfig(**base, trim_token_cols=False))
    assert trimmed.text_ids.shape[1] <= 16 < full.text_ids.shape[1]
    assert trimmed.tags_ids.shape[1] % 8 == 0
    for tr, fu, w in ((trimmed.tags_ids, full.tags_ids, None),
                      ((trimmed.text_ids, trimmed.text_cnt),
                       (full.text_ids, full.text_cnt), True)):
        if w is None:
            a = affinity.counts_from_tokens(jnp.asarray(tr), None, 64)
            b = affinity.counts_from_tokens(jnp.asarray(fu), None, 64)
        else:
            a = affinity.counts_from_tokens(jnp.asarray(tr[0]),
                                            jnp.asarray(tr[1]), 128)
            b = affinity.counts_from_tokens(jnp.asarray(fu[0]),
                                            jnp.asarray(fu[1]), 128)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
