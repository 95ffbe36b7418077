"""Host-side featurization: raw modality records -> fixed-width device tensors.

The reference feeds raw object arrays (strings, tag lists, NaN floats) into
per-window sklearn calls (reference matrix_operations.py:55-110).  XLA needs
static shapes, so strings are hashed on the host into fixed-width integer /
multi-hot tensors once per window:

  username -> stable int32 id (equality is all that matters, ref :55-72)
  tags     -> (n, H_tags) multi-hot over hashed tag tokens  (Jaccard, ref :84-89)
  text     -> (n, H_text) token-count vector over hashed words (TF-IDF, ref :102-108)

Hashing-trick collisions perturb neighbor rankings slightly; parity is at the
metric level (SURVEY.md §7.3).  A C++ fast path for the token hashing lives in
mused_tpu/native (falls back to this pure-Python implementation).
"""
from __future__ import annotations

import re
import zlib
from typing import NamedTuple, Sequence

import numpy as np

from mused_tpu.utils.config import FeatureConfig

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def stable_hash(token: str) -> int:
    """Process-stable 32-bit hash (Python's builtin hash is salted)."""
    return zlib.crc32(token.encode("utf-8", "ignore"))


def hash_usernames(usernames: Sequence[str]) -> np.ndarray:
    """(n,) int32 ids; -1 marks empty usernames (invalid, ref :59)."""
    out = np.empty(len(usernames), np.int32)
    seen: dict[str, int] = {}
    for i, u in enumerate(usernames):
        u = u if isinstance(u, str) else ""
        if u == "":
            out[i] = -1
        else:
            out[i] = seen.setdefault(u, len(seen))
    return out


def multihot_tags(tag_lists: Sequence, dim: int) -> np.ndarray:
    """(n, dim) float32 0/1 incidence of hashed tag tokens.

    A row with no tags is all-zero => invalid (ref :79).  Duplicate tags
    collapse (sets in the reference, ref :84).  Uses the native C++ hasher
    when available (bit-identical CRC32); this Python loop is the fallback.
    """
    from mused_tpu import native
    fast = native.multihot_tags(tag_lists, dim)
    if fast is not None:
        return fast
    out = np.zeros((len(tag_lists), dim), np.float32)
    for i, tags in enumerate(tag_lists):
        if tags is None or isinstance(tags, float):
            continue          # None / pandas NaN cell: no tags (review r5:
                              # iterating a float raised TypeError)
        if isinstance(tags, str):
            tags = [tags] if tags else []
        for t in tags:
            if t:
                out[i, stable_hash(str(t)) % dim] = 1.0
    return out


def hash_text_counts(texts: Sequence[str], dim: int) -> np.ndarray:
    """(n, dim) float32 token counts of hashed lowercase word tokens.

    Mirrors TfidfVectorizer's default token_pattern on the reference's
    pre-cleaned text (clean_text already lowercases and strips punctuation,
    ref data_loader.py:180-185); single-char tokens are dropped like
    sklearn's ``(?u)\\b\\w\\w+\\b``.  Uses the native C++ hasher when
    available (bit-identical CRC32); this Python loop is the fallback.
    """
    from mused_tpu import native
    fast = native.hash_text_counts(list(texts), dim)
    if fast is not None:
        return fast
    out = np.zeros((len(texts), dim), np.float32)
    for i, text in enumerate(texts):
        if not isinstance(text, str) or not text:
            continue
        for tok in _TOKEN_RE.findall(text.lower()):
            if len(tok) >= 2:
                out[i, stable_hash(tok) % dim] += 1.0
    return out


class WindowFeatures(NamedTuple):
    """Device-ready tensors for one window of n records."""

    location: np.ndarray    # (n, 2) float32, NaN = invalid
    times: np.ndarray       # (n, 2) float32, 0 = invalid (window-centered,
                            # see featurize_window: diffs are shift-invariant)
    user_ids: np.ndarray    # (n,)  int32, -1 = invalid
    tags: np.ndarray        # (n, H_tags) uint8 multi-hot (cast to f32 on device)
    text: np.ndarray        # (n, H_text) uint8 counts (cast to f32 on device)
    tags_valid: np.ndarray  # (n,) bool — reference quirk (ref :79): a row is
                            # a tags participant unless its raw cell is the
                            # EMPTY STRING; an empty tag LIST is still valid
                            # and emits k zero-similarity argsort edges


class SparseWindowFeatures(NamedTuple):
    """Sparse token layout: ~16x less host->device transfer than the dense
    multi-hot/count tensors (and 100x less host memory at 150k-row scale);
    the device scatters them back to dense just before the sim matmuls
    (affinity.counts_from_tokens)."""

    location: np.ndarray    # (n, 2) float32
    times: np.ndarray       # (n, 2) float32 (window-centered)
    user_ids: np.ndarray    # (n,)  int32
    tags_ids: np.ndarray    # (n, T_tags) hashed tag ids, -1 padding; int16
                            # when the hash dim fits (halves tunnel traffic)
    text_ids: np.ndarray    # (n, T_text) hashed token ids, -1 padding; int16
                            # when the hash dim fits
    text_cnt: np.ndarray    # (n, T_text) uint8 token counts (saturating at
                            # 255 — beyond any real per-doc token count)
    tags_valid: np.ndarray  # (n,) bool (see WindowFeatures.tags_valid)


def hash_text_sparse_py(texts: Sequence[str], dim: int, t_cap: int):
    """Python fallback for the native sparse text hasher (same first-seen
    token order, same dedup, same overflow-drop semantics)."""
    n = len(texts)
    ids = np.full((n, t_cap), -1, np.int32)
    cnt = np.zeros((n, t_cap), np.uint16)
    for i, text in enumerate(texts):
        if not isinstance(text, str) or not text:
            continue
        seen: dict[int, int] = {}
        for tok in _TOKEN_RE.findall(text.lower()):
            if len(tok) < 2:
                continue
            h = stable_hash(tok) % dim
            if h in seen:
                cnt[i, seen[h]] += 1
            elif len(seen) < t_cap:
                seen[h] = len(seen)
                ids[i, seen[h]] = h
                cnt[i, seen[h]] = 1
    return ids, cnt


def multihot_tags_sparse_py(tag_lists: Sequence, dim: int, t_cap: int):
    n = len(tag_lists)
    ids = np.full((n, t_cap), -1, np.int32)
    for i, tags in enumerate(tag_lists):
        if tags is None:
            continue
        if isinstance(tags, str):
            tags = [tags] if tags else []
        seen: list[int] = []
        for t in tags:
            if not t:
                continue
            h = stable_hash(str(t)) % dim
            if h not in seen and len(seen) < t_cap:
                seen.append(h)
                ids[i, len(seen) - 1] = h
    return ids


def featurize_window(location: np.ndarray, times: np.ndarray,
                     usernames: np.ndarray, tag_lists: np.ndarray,
                     texts: np.ndarray, cfg: FeatureConfig) -> WindowFeatures:
    """Featurize the raw per-modality object arrays of one window.

    Argument layout matches the reference's modality arrays from
    prepare_modalities (ref data_loader.py:86-113): location (n,2) float,
    times (n,2) float, usernames (n,1) object, tag_lists (n,1) object,
    texts (n,2) object [title, description].
    """
    n = len(location)
    title_desc = []
    for i in range(n):
        t = texts[i, 0] if isinstance(texts[i, 0], str) else ""
        d = texts[i, 1] if isinstance(texts[i, 1], str) else ""
        # reference joins title and description with a space (ref :102)
        joined = (t + " " + d).strip()
        title_desc.append(joined)
    loc = np.asarray(location, np.float32)
    # Center timestamps per window before the float32 cast: epoch-scale
    # values (~1e9 s) lose sub-64s precision in f32, which perturbs kNN
    # tie-breaking vs the reference's float64 diffs (ref :40-53).  Diffs are
    # shift-invariant, so shift each column so the smallest valid value is
    # 1.0; invalid rows stay exactly 0 (the reference's invalid sentinel).
    tim64 = np.asarray(times, np.float64)
    with np.errstate(invalid="ignore"):
        t_valid = (np.nan_to_num(tim64[:, 0]) != 0.0) \
            & (np.nan_to_num(tim64[:, 1]) != 0.0) \
            & np.isfinite(tim64).all(axis=1)
    tim = np.zeros_like(tim64, dtype=np.float32)
    if t_valid.any():
        shift = tim64[t_valid].min(axis=0) - 1.0
        tim[t_valid] = (tim64[t_valid] - shift[None, :]).astype(np.float32)
    uids = hash_usernames([u[0] for u in usernames])
    # normalize missing cells FIRST: a pandas NaN (float) tags cell crashed
    # the tokenizers and counted as a VALID tags participant (review r5) —
    # missing means the same as the reference's empty-string cell
    tag_cells_raw = ["" if c is None or isinstance(c, float) else c
                     for c in (t[0] for t in tag_lists)]
    # reference tags validity (ref :79): only the empty STRING is invalid
    tags_valid = np.array(
        [not (isinstance(c, str) and c == "") for c in tag_cells_raw], bool)

    if cfg.sparse:
        from mused_tpu import native
        sp_text = native.hash_text_sparse(title_desc, cfg.text_hash_dim,
                                          cfg.text_token_cap)
        if sp_text is None:
            sp_text = hash_text_sparse_py(title_desc, cfg.text_hash_dim,
                                          cfg.text_token_cap)
        sp_tags = native.multihot_tags_sparse(tag_cells_raw, cfg.tags_hash_dim,
                                              cfg.tags_token_cap)
        if sp_tags is None:
            sp_tags = multihot_tags_sparse_py(tag_cells_raw, cfg.tags_hash_dim,
                                              cfg.tags_token_cap)
        # halve host->device traffic: ids fit int16 for hash dims < 32768
        # (the -1 padding survives), counts saturate at uint8
        def _slim_ids(ids, dim):
            return ids.astype(np.int16) if dim < 32768 else ids

        tags_ids = _slim_ids(sp_tags, cfg.tags_hash_dim)
        text_ids = _slim_ids(sp_text[0], cfg.text_hash_dim)
        text_cnt = np.minimum(sp_text[1], 255).astype(np.uint8)
        if cfg.trim_token_cols:
            # tokens fill columns left to right, so the columns beyond the
            # window's max occupancy are pure -1/0 padding: slice them off
            # (rounded up to a multiple of 8 so widths - and therefore
            # compiled graphs - stay few).  Typical records carry far fewer
            # tokens than the worst-case caps; on the transfer-bound remote
            # link this is the biggest per-window byte saving.
            # Width rounds up to a POWER OF TWO (>= 8, capped at the config
            # cap): every distinct width compiles a fresh XLA graph (minutes
            # each on the remote compiler), so widths must be few and sticky
            # even when per-window occupancy drifts.
            def _width(ids):
                occupied = int((ids >= 0).sum(axis=1).max(initial=0))
                return min(ids.shape[1],
                           1 << max(3, (max(occupied, 1) - 1).bit_length()))
            wt = _width(tags_ids)
            wx = _width(text_ids)
            tags_ids = tags_ids[:, :wt]
            text_ids, text_cnt = text_ids[:, :wx], text_cnt[:, :wx]
        return SparseWindowFeatures(location=loc, times=tim, user_ids=uids,
                                    tags_ids=tags_ids,
                                    text_ids=text_ids,
                                    text_cnt=text_cnt,
                                    tags_valid=tags_valid)

    # dense path: uint8 tensors (token counts never approach 255); still 4x
    # smaller transfers than f32, device casts back on arrival
    tags8 = np.minimum(multihot_tags(tag_cells_raw, cfg.tags_hash_dim),
                       255).astype(np.uint8)
    text8 = np.minimum(hash_text_counts(title_desc, cfg.text_hash_dim),
                       255).astype(np.uint8)
    return WindowFeatures(location=loc, times=tim, user_ids=uids,
                          tags=tags8, text=text8, tags_valid=tags_valid)
