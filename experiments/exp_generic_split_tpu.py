"""TPU hardware check of the bf16-packed generic kinds (embedding/default).

generic_columns stores SINGLE bf16 tensors (blocked_affinity.bf16_pack;
late round 5 — this same probe revalidated the switch from the 2x-width
split_bf16 packing, whose positional dot has the same bf16-input accuracy
class): the strip path, the stride-binned kernel, and the CPU emulation
all rank by the same bf16-rounded sims.  The CPU tests pin semantic
consistency; this probe checks the KERNEL route on the real chip (dot +
chord metrics with bf16 operands) and measures the strip-vs-binned block
cost:

  1. edge agreement strip vs binned at nbins == n (same sims, different
     selection engines — expect ~100%, residual is accumulation-order tie
     churn at f32 epsilon scale),
  2. per-block wall time strip vs binned at nbins = n/64.

Run on the TPU host (no conftest): python experiments/exp_generic_split_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from mused_tpu.utils.runtime import enable_compilation_cache


def _time_block(fn, reps=5):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())
    from mused_tpu.ops import blocked_affinity as ba

    def make_cols(n):
        rng = np.random.default_rng(11)
        emb = rng.standard_normal((n, 384)).astype(np.float32)
        emb[rng.random(n) < 0.02] = np.nan
        dflt = (rng.standard_normal((n, 128)) * 3).astype(np.float32)
        dflt[rng.random(n) < 0.02] = np.nan
        return ba.generic_columns([emb, dflt], ("embedding", "default"))

    fails = 0
    # 1. agreement at nbins == n (kernel route on TPU vs strip).  Small n:
    # nbins == n is the CPU exactness configuration — its (block, nbins)
    # f32 VMEM accumulator only fits for modest n (production runs n/64)
    n1, block1, kb = 2048, 512, 5
    cols1 = make_cols(n1)
    print("kinds:", cols1.kinds,
          "widths:", [t[0].shape[1] if isinstance(t, tuple) else t.shape[1]
                      for t in cols1.tensors])
    for start in (0, 1024):
        strip = np.asarray(ba.fused_rowblock(
            cols1, jnp.int32(start), block1, kb)) > 0
        binned = np.asarray(ba.fused_rowblock(
            cols1, jnp.int32(start), block1, kb, select="binned",
            nbins=n1)) > 0
        inter = (strip & binned).sum()
        union = (strip | binned).sum()
        agree = inter / max(union, 1)
        print(f"start={start}: edge agreement={agree:.6f} "
              f"(strip={strip.sum()} binned={binned.sum()})")
        fails += agree < 0.999

    # 2. block cost, strip vs binned at the production nbins
    n, block = 16384, 2048
    cols = make_cols(n)
    nbins = max(128, (n // 64) // 128 * 128)
    strip_fn = jax.jit(lambda: ba.fused_rowblock(
        cols, jnp.int32(2048), block, kb))
    binned_fn = jax.jit(lambda: ba.fused_rowblock(
        cols, jnp.int32(2048), block, kb, select="binned", nbins=nbins))
    ts = _time_block(strip_fn)
    tb = _time_block(binned_fn)
    print(f"block cost (n={n}, block={block}): strip {ts*1e3:.1f} ms, "
          f"binned(nbins={nbins}) {tb*1e3:.1f} ms ({ts/tb:.2f}x)")

    print("RESULT:", "PASS" if fails == 0 else f"FAIL ({fails})")


if __name__ == "__main__":
    main()
