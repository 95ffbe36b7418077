"""TPU hardware validation of the column-sharded kernel path.

The colsharded sweep's kernel invocation (binned_candidates_pallas with the
row_stats operand and a shard-local, possibly-negative start_adj) had only
run via the bit-equal XLA emulation on the CPU mesh (tunnel was down).
This probe runs it on the real chip:

  1. p=1 colsharded fused rows vs the single-chip binned path (both on the
     Pallas kernel) — must be bit-equal.
  2. p=1 colsharded FD sketch vs single-chip blocked_fd_sketch — Gram to
     rounding, Frobenius exact, honest bound holds.

Run on the TPU host (no conftest): python experiments/exp_colsharded_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.utils.runtime import enable_compilation_cache


def _standard_window(rng, n=512, h_tags=256, h_text=512):
    from mused_tpu.data import features as feat
    loc = rng.uniform(low=(-60.0, -170.0), high=(60.0, 170.0),
                      size=(n, 2)).astype(np.float32)
    loc[rng.random(n) < 0.1] = np.nan
    tim = rng.uniform(1.0, 1e5, size=(n, 2)).astype(np.float32)
    tim[rng.random(n) < 0.1] = 0.0
    uid = rng.integers(0, 40, size=n).astype(np.int32)
    uid[rng.random(n) < 0.1] = -1
    tags = (rng.random((n, h_tags)) < 0.02).astype(np.uint8)
    text = rng.poisson(0.05, size=(n, h_text)).astype(np.uint8)
    tags_valid = rng.random(n) < 0.9
    return feat.WindowFeatures(location=loc, times=tim, user_ids=uid,
                               tags=tags, text=text, tags_valid=tags_valid)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())
    from mused_tpu.ops import blocked_affinity as ba, fd
    from mused_tpu.parallel import colsharded as cs
    from jax.sharding import Mesh

    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                 ("data", "model"))
    rng = np.random.default_rng(7)
    wf = _standard_window(rng, n=512)
    cols = ba.standard_columns(wf)
    nbins, block, ell, kb = 128, 64, 16, 3

    fails = 0
    for start in (0, 192, 448):
        ours = np.asarray(cs.colsharded_fused_rows(
            tuple(wf), ("standard",), start=start, block=block,
            k_basis=kb, mesh=mesh1, nbins=nbins))
        ref = np.asarray(ba.fused_rowblock(
            cols, jnp.int32(start), block, kb, select="binned",
            nbins=nbins)) > 0
        eq = np.array_equal(ours, ref)
        print(f"fused rows start={start}: bit-equal={eq} "
              f"(edges ours={int(ours.sum())} ref={int(ref.sum())})")
        fails += not eq

    for mode in ("eigh", "subspace"):
        sk, sq, loss = cs.colsharded_blocked_fd_sketch(
            tuple(wf), ("standard",), ell=ell, block=block, k_basis=kb,
            mesh=mesh1, mode=mode, nbins=nbins)
        sk1, sq1, loss1 = ba.blocked_fd_sketch(
            cols, ell=ell, block=block, k_basis=kb, mode=mode,
            select="binned", nbins=nbins)
        sk, sq, loss = (np.asarray(sk, np.float64), float(sq), float(loss))
        sk1 = np.asarray(sk1, np.float64)
        g, g1 = sk.T @ sk, sk1.T @ sk1
        scale = max(np.abs(g1).max(), 1.0)
        gram_ok = np.allclose(g, g1, atol=5e-2 * scale)
        sq_ok = abs(sq - float(sq1)) <= 1e-6 * max(sq, 1.0)
        full = np.concatenate(
            [np.asarray(ba.fused_rowblock(cols, jnp.int32(s), block, kb,
                                          select="binned", nbins=nbins))
             for s in range(0, 512, block)])
        err = float(fd.covariance_error(jnp.asarray(full),
                                        jnp.asarray(sk, jnp.float32)))
        bound = min(loss, sq / ell)
        bound_ok = err <= bound * 1.01 + 1e-3
        print(f"fd mode={mode}: gram_ok={gram_ok} sq_ok={sq_ok} "
              f"bound_ok={bound_ok} (err={err:.1f} bound={bound:.1f})")
        fails += (not gram_ok) + (not sq_ok) + (not bound_ok)

    print("RESULT:", "PASS" if fails == 0 else f"FAIL ({fails})")


if __name__ == "__main__":
    main()
