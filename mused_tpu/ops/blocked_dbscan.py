"""Blocked DBSCAN: density clustering beyond the dense n^2 cap.

The dense device DBSCAN (ops/dbscan.py) materializes the (n, n) eps-graph —
fine to ~32k rows.  This variant rematerializes (B, n) distance blocks inside
``lax.scan`` sweeps instead (same trade as ops/blocked_affinity):

  1. degree sweep  -> core mask                     (one n^2/B block sweep)
  2. min-label propagation over the core-core eps-graph, one sweep per
     round + POINTER JUMPING (labels <- labels[labels], O(n) gathers) which
     compresses label paths so rounds ~ log(diameter) instead of diameter
  3. border sweep  -> the MINIMUM-LABELED core neighbor's root
     within eps (matching the dense kernel; one sweep)

Labels match the dense kernel exactly (same definition, same first-occurrence
compaction); tested for equality.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.ops.dbscan import _first_occurrence_compaction
from mused_tpu.ops.kmeans import _sq_dists


def _pad_rows(x, block):
    pad = (-x.shape[0]) % block
    if pad:
        # padding rows far away but f32-safe: inf coords would make the
        # expanded-norm distances NaN (inf - inf); 1e15 keeps d2 ~ 1e30,
        # finite and never within eps
        x = jnp.concatenate(
            [x, jnp.full((pad, x.shape[1]), 1e15, x.dtype)], axis=0)
    return x


@functools.partial(jax.jit, static_argnames=("block",))
def _degree_sweep(x, eps, *, block: int):
    n = x.shape[0]
    xs = x.reshape(n // block, block, -1)

    def body(_, xb):
        d2 = _sq_dists(xb, x)
        return None, jnp.sum((d2 <= eps * eps).astype(jnp.int32), axis=1)

    _, deg = jax.lax.scan(body, None, xs)
    return deg.reshape(n)


@functools.partial(jax.jit, static_argnames=("block",))
def _propagate_once(x, labels, core, eps, *, block: int):
    """One blocked min-label sweep over core-core edges + pointer jumping."""
    n = x.shape[0]
    xs = x.reshape(n // block, block, -1)
    core_blocks = core.reshape(n // block, block)

    def body(_, xs_b):
        xb, core_b = xs_b
        d2 = _sq_dists(xb, x)
        edge = (d2 <= eps * eps) & core_b[:, None] & core[None, :]
        neigh_min = jnp.min(jnp.where(edge, labels[None, :], n), axis=1)
        return None, neigh_min.astype(jnp.int32)

    _, mins = jax.lax.scan(body, None, (xs, core_blocks))
    new = jnp.minimum(labels, mins.reshape(n))
    # pointer jumping: labels are root row-indices, so composing the map
    # halves path lengths per hop.  Restrict to CORE rows: the "no label"
    # sentinel n clamps to row n-1, and non-core rows chasing that junk
    # kept `changed` True for extra full sweeps after the core labels had
    # converged (review r5 — output was unaffected, rounds were wasted)
    is_core_label = new < n
    for _ in range(3):
        jumped = jnp.minimum(new, new[jnp.clip(new, 0, n - 1)])
        new = jnp.where(is_core_label, jumped, new)
    return new, jnp.any((new != labels) & is_core_label)


@functools.partial(jax.jit, static_argnames=("block",))
def _border_sweep(x, labels, core, eps, *, block: int):
    n = x.shape[0]
    xs = x.reshape(n // block, block, -1)

    def body(_, xb):
        d2 = _sq_dists(xb, x)
        edge = (d2 <= eps * eps) & core[None, :]
        return None, jnp.min(jnp.where(edge, labels[None, :], n),
                             axis=1).astype(jnp.int32)

    _, mins = jax.lax.scan(body, None, xs)
    return mins.reshape(n)


def dbscan_blocked(data, eps: float = 0.5, min_samples: int = 5,
                   block: int = 2048, max_rounds: int = 64) -> np.ndarray:
    """DBSCAN labels for (n, d) points of any n; noise = -1.

    Host loop over propagation rounds (each round is one jitted n^2/B sweep +
    pointer jumps); terminates at the fixpoint, which pointer jumping reaches
    in ~log(diameter) rounds.
    """
    x = jnp.asarray(np.asarray(data, np.float32))
    n = len(x)
    block = min(block, n)
    xp = _pad_rows(x, block)
    np_ = xp.shape[0]
    eps_j = jnp.float32(eps)

    deg = _degree_sweep(xp, eps_j, block=block)[:n]
    core = jnp.concatenate(
        [deg >= min_samples, jnp.zeros((np_ - n,), bool)])
    labels = jnp.where(core, jnp.arange(np_), np_).astype(jnp.int32)

    for _ in range(max_rounds):
        labels, changed = _propagate_once(xp, labels, core, eps_j, block=block)
        if not bool(changed):
            break

    border_min = _border_sweep(xp, labels, core, eps_j, block=block)
    is_border = (~core) & (border_min < np_)
    roots = jnp.where(core, labels,
                      jnp.where(is_border, border_min, 0)).astype(jnp.int32)
    clustered = core | is_border
    out = _first_occurrence_compaction(roots, clustered)
    return np.asarray(out)[:n]
