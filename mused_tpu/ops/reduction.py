"""Dimensionality reduction: jitted truncated SVD (randomized range finder).

Replaces sklearn's ``TruncatedSVD(n_components, random_state).fit_transform``
(reference matrix_operations.py:143-147) — which is itself Halko-style
randomized SVD — with a pure-JAX implementation whose heavy ops (matmul, QR of
a tall-skinny block, small SVD) all map onto the MXU.

``reduced = X @ V_r`` (equivalently ``U_r @ diag(s_r)``), matching sklearn's
fit_transform output up to the usual sign/rotation ambiguity (comparisons in
tests are subspace- and spectrum-level; the pipeline only needs geometry, see
SURVEY.md §7.3 'Numerical parity').
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("rank", "n_iter", "oversample"))
def randomized_svd(x: jax.Array, rank: int, key: jax.Array,
                   *, n_iter: int = 4, oversample: int = 10):
    """Top-``rank`` SVD of (n, d) x.  Returns (u (n,r), s (r,), vt (r, d)).

    Halko/Martinsson/Tropp randomized range finder with ``n_iter`` power
    iterations (QR-stabilized), like sklearn's `randomized_svd` defaults.
    """
    n, d = x.shape
    k = min(rank + oversample, min(n, d))
    omega = jax.random.normal(key, (d, k), x.dtype)
    y = x @ omega                                  # (n, k)
    q, _ = jnp.linalg.qr(y)

    def power_step(q, _):
        z, _ = jnp.linalg.qr(x.T @ q)              # (d, k)
        q, _ = jnp.linalg.qr(x @ z)                # (n, k)
        return q, None

    q, _ = jax.lax.scan(power_step, q, None, length=n_iter)
    b = q.T @ x                                    # (k, d) small
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :rank], s[:rank], vt[:rank]


@functools.partial(jax.jit, static_argnames=("k_max", "k_min", "theta"))
def eigengap_k(reduced: jax.Array, *, k_max: int, k_min: int = 1,
               theta: float = 0.15) -> jax.Array:
    """Unsupervised per-window cluster-count estimate (no reference analog —
    the reference leaks ground truth into the count, main.py:41/97).

    Column j of the reduced window scales with singular value sigma_j of the
    fused adjacency (SWFDMC: rows of the sketch are Sigma'V^T, so the
    transposed sketch's columns; randomized SVD: X V_r = U_r Sigma_r), so
    column energies e_j = sum_i reduced[i, j]^2 trace the sigma^2 profile.
    For a kNN graph with c well-separated clusters that profile has c
    dominant values; the classic eigengap rule picks k at the largest
    relative gap within the leading ``k_max`` energies.  Device-only (a few
    hundred FLOPs) — composes into the jitted window step, so unsupervised
    runs stay one dispatch per window.

    The i=1 gap needs special handling: e_1 is the graph's Perron/degree
    direction, which inflates with noise even when cluster structure is
    intact, and its relative gap to e_2 then beats every structural gap —
    measured on planted-event windows, 6 events at noise 0.65 answered
    k=1 (true gap 0.26 at i=7 lost to the Perron gap 0.53).  A pure-noise
    window shows the SAME leading profile, so e_1/e_2 alone cannot
    separate the cases; what does is the existence of a strong secondary
    gap.  The i=1 gap therefore only competes when no later gap exceeds
    ``theta`` — structureless windows (no strong secondary gap anywhere)
    still answer 1, while noisy-but-clustered windows recover the planted
    count (validated across noise 0.3–0.65, 1–12 events, 3 seeds).
    """
    e = jnp.sort(jnp.sum(reduced * reduced, axis=0))[::-1]
    m = min(k_max + 1, e.shape[0])
    e = e[:m]
    gaps = (e[:-1] - e[1:]) / jnp.maximum(e[:-1], 1e-30)
    # Only energies still significant vs the leading one are gap candidates:
    # zero-padded columns (svd_reduce pads past rank; FD zeroes trailing
    # sketch rows) make the relative gap at the RANK cutoff exactly 1.0,
    # which would always beat a real cluster gap and return k ~= rank.
    significant = e[:-1] >= 0.02 * e[0]
    # ... and a gap INTO the numerically-zero padding tail is the rank-
    # cutoff artifact itself, masked regardless of its leading energy
    # (review r5: the leading-energy mask alone let the artifact win
    # whenever the last real energy was >= 2% of e[0] — energies
    # [100, 60, 55, 20, 18, 16, 0, ...] answered k=6 against the true
    # structural gap at k=3)
    significant = significant & (e[1:] > 1e-9 * e[0])
    gaps = jnp.where(significant, gaps, -1.0)
    if gaps.shape[0] > 1:
        strong_secondary = jnp.max(gaps[1:]) > theta
        gaps = gaps.at[0].set(jnp.where(strong_secondary, -1.0, gaps[0]))
    k = jnp.argmax(gaps) + 1
    return jnp.clip(k, k_min, k_max).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("reduced_dim",))
def svd_reduce(matrix: jax.Array, reduced_dim: int, key: jax.Array) -> jax.Array:
    """TruncatedSVD.fit_transform equivalent (reference matrix_operations.py:143-147).

    Clamps components to ``min(reduced_dim, d - 1)`` exactly like the
    reference, then pads back to ``reduced_dim`` columns with zeros so the
    output shape stays static for downstream jit consumers.
    """
    d = matrix.shape[1]
    r = min(reduced_dim, d - 1)
    u, s, _ = randomized_svd(matrix, r, key)
    out = u * s[None, :]
    # pad relative to the ACTUAL factor width: randomized_svd can return
    # fewer than r columns when the window has fewer rows than the clamped
    # rank (n < reduced_dim), and padding by reduced_dim - r alone then
    # broke the static-shape contract downstream jit consumers rely on
    # (review r5: (5, 200) came back (5, 5) instead of (5, reduced_dim))
    if out.shape[1] < reduced_dim:
        pad = jnp.zeros((matrix.shape[0], reduced_dim - out.shape[1]),
                        matrix.dtype)
        out = jnp.concatenate([out, pad], axis=1)
    return out
