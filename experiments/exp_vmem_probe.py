"""Probe usable VMEM on the attached TPU: compile pallas kernels with
increasing scratch sizes until the compiler refuses."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mused_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

print("backend:", jax.default_backend())


def probe(mb):
    rows = mb * 1024 * 1024 // (128 * 4)

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[:] = x_ref[:] + scratch[0, 0]

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        )(jnp.ones((8, 128), jnp.float32))
        np.asarray(out)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"  {mb} MB failed: {type(e).__name__}: {str(e)[:160]}")
        return False


for mb in (16, 32, 64, 96, 112, 120, 128):
    ok = probe(mb)
    print(f"scratch {mb:4d} MB: {'OK' if ok else 'FAIL'}")
    if not ok:
        break
