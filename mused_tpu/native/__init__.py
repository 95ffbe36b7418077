"""ctypes loader for the native feature hasher (lazy build, Python fallback).

The C++ library (hasher.cpp) hashes text tokens / tags into fixed-width
tensors ~30x faster than the pure-Python loop in data/features.py; both use
CRC32 so outputs are bit-identical.  If the library is missing it is built
with make on first use; if the toolchain is unavailable the caller falls back
to Python silently.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmused_hasher.so")
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mused_hash_text_counts.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.mused_multihot_tags.argtypes = lib.mused_hash_text_counts.argtypes
        lib.mused_hash_text_sparse.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint16)]
        lib.mused_multihot_tags_sparse.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except (OSError, subprocess.SubprocessError):
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _c_strings(items) -> "ctypes.Array":
    arr = (ctypes.c_char_p * len(items))()
    arr[:] = [s.encode("utf-8", "ignore") for s in items]
    return arr


def hash_text_counts(texts, dim: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((len(texts), dim), np.float32)
    arr = _c_strings([t if isinstance(t, str) else "" for t in texts])
    lib.mused_hash_text_counts(
        arr, len(texts), dim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def hash_text_sparse(texts, dim: int, t_cap: int):
    """(ids (n, t_cap) int32 with -1 padding, counts (n, t_cap) uint16) of
    deduped hashed tokens per document, or None without the library."""
    lib = _load()
    if lib is None:
        return None
    n = len(texts)
    ids = np.full((n, t_cap), -1, np.int32)
    cnt = np.zeros((n, t_cap), np.uint16)
    arr = _c_strings([t if isinstance(t, str) else "" for t in texts])
    lib.mused_hash_text_sparse(
        arr, n, dim, t_cap,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return ids, cnt


def multihot_tags_sparse(tag_lists, dim: int, t_cap: int):
    """(n, t_cap) int32 deduped hashed tag ids (-1 padding), or None."""
    lib = _load()
    if lib is None:
        return None
    rows = []
    for tags in tag_lists:
        if tags is None:
            rows.append("")
        elif isinstance(tags, str):
            rows.append(tags)
        else:
            rows.append("\x1f".join(str(t) for t in tags if t))
    ids = np.full((len(rows), t_cap), -1, np.int32)
    arr = _c_strings(rows)
    lib.mused_multihot_tags_sparse(
        arr, len(rows), dim, t_cap,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return ids


def multihot_tags(tag_lists, dim: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    rows = []
    for tags in tag_lists:
        if tags is None:
            rows.append("")
        elif isinstance(tags, str):
            rows.append(tags)
        else:
            rows.append("\x1f".join(str(t) for t in tags if t))
    out = np.zeros((len(rows), dim), np.float32)
    arr = _c_strings(rows)
    lib.mused_multihot_tags(
        arr, len(rows), dim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
