"""Load the ACTUAL reference pipeline (/root/reference) with faithful stubs.

Importable outside pytest (tests/test_reference_parity.py carries the
pytest-scoped twin) so long head-to-head drivers (refparity_driver.py) can
run the reference's real control flow.  The reference cannot import as-is:
its swfd git submodule is absent and incdbscan/hdbscan/ot are not installed
(SURVEY.md §0).  Each stub reproduces the consumed contract faithfully:

  ot         -> numpy Sinkhorn-Knopp with POT's defaults (numItermax=1000,
                stopThr=1e-9) — the contract matrix_operations.py:198 uses
  hdbscan    -> sklearn.cluster.HDBSCAN (independent implementation, same
                constructor surface, matrix_operations.py:240-243)
  incdbscan  -> exact DBSCAN over all inserted points (the semantics
                incdbscan maintains incrementally, main.py:89-91)
  swfd       -> ExactWindowSWFD: the EXACT sliding-window rank-l sketch
                (SVD truncation of the live window) that SeqBasedSWFD
                approximates — an upper-quality anchor for the missing
                submodule, satisfying the call-site contract main.py:60-76
                (fit(row) per row, get() -> (B, ...) with B (l, d)).

This is a comparison harness, not a port: reference modules are imported
from their own tree at run time, never vendored.
"""
from __future__ import annotations

import collections
import sys
import types

import numpy as np

REFERENCE_DIR = "/root/reference"


def sinkhorn_np(a, b, M, reg=0.1, numItermax=1000, stopThr=1e-9):
    """Faithful numpy Sinkhorn-Knopp (POT ``ot.sinkhorn`` contract)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    K = np.exp(-np.asarray(M, np.float64) / reg)
    u = np.ones_like(a)
    v = np.ones_like(b)
    for _ in range(numItermax):
        u_prev = u
        u = a / np.maximum(K @ v, 1e-300)
        v = b / np.maximum(K.T @ u, 1e-300)
        if np.max(np.abs(u - u_prev)) < stopThr:
            break
    return u[:, None] * K * v[None, :]


class IncrementalDBSCANStub:
    """Exact-semantics stand-in for ``incdbscan`` (reference main.py:89-91):
    incdbscan maintains exact DBSCAN clusters under insertion, so re-running
    DBSCAN over every inserted point IS the defining behavior."""

    def __init__(self, eps, min_pts):
        self.eps, self.min_pts = eps, min_pts
        self._pts = None

    def insert(self, X):
        X = np.asarray(X)
        self._pts = X if self._pts is None else np.vstack([self._pts, X])
        return self

    def get_cluster_labels(self, X):
        from sklearn.cluster import DBSCAN
        labels = DBSCAN(eps=self.eps, min_samples=self.min_pts,
                        metric="euclidean").fit_predict(self._pts)
        return labels[-len(X):]


class ExactWindowSWFD:
    """Exact sliding-window sketch: the rank-l SVD truncation of the last N
    rows — the quality CEILING that SeqBasedSWFD's Frequent-Directions
    blocks approximate (FD bound: ||A^T A - B^T B||_2 <= ||A||_F^2/l).

    Satisfies the reconstructed call-site contract (SURVEY.md §2.8;
    reference main.py:60-76): ctor (N, R, d, sketch_dim); ``fit(row)`` with
    one (1, d) row; ``get()`` returns a 4-tuple whose first element is the
    (sketch_dim, d) sketch.  Using the exact sketch on the reference side
    anchors the comparison at the best the missing submodule could do.
    """

    def __init__(self, N, R, d, sketch_dim):
        self.N, self.d, self.ell = int(N), int(d), int(sketch_dim)
        self._rows = collections.deque(maxlen=self.N)

    def fit(self, row):
        self._rows.append(np.asarray(row, np.float64).reshape(-1))

    def get(self):
        A = np.asarray(self._rows)
        _, s, Vt = np.linalg.svd(A, full_matrices=False)
        k = min(self.ell, len(s))
        B = s[:k, None] * Vt[:k]
        if B.shape[0] < self.ell:
            B = np.vstack([B, np.zeros((self.ell - B.shape[0], self.d))])
        return B, None, None, None


def load_reference():
    """Install faithful stubs and import the reference engine.

    Returns (ref_main, ref_metrics).  Idempotent: repeated calls reuse the
    already-imported modules.  The reference tree stays on sys.path so its
    intra-package imports keep resolving.
    """
    import sklearn.cluster
    for name, attrs in (
            ("swfd", {"SeqBasedSWFD": ExactWindowSWFD}),
            ("incdbscan", {"IncrementalDBSCAN": IncrementalDBSCANStub}),
            ("hdbscan", {"HDBSCAN": sklearn.cluster.HDBSCAN}),
            ("ot", {"sinkhorn": sinkhorn_np})):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import main as ref_main
    import metrics_evaluation as ref_metrics
    return ref_main, ref_metrics
