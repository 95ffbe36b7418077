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
    assert wf.text.sum() > 0 and wf.tags.sum() > 0
