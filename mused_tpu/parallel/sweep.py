"""Sweep-level scale-out: independent experiment points across devices.

The reference's sweep loop (main.py:176-240) is embarrassingly parallel
across (approach, variable_value) points — SURVEY.md §5.8 maps this to
DCN-level scale-out across slices.  On a single host this runs one point per
device (threads + ``jax.default_device``); across hosts the same function
shape applies with one process per slice.

Semantics note: the reference mutates ``params["noise_rate"]`` with the
measured rate across sweep iterations (main.py:196, an order-dependent
quirk).  Parallel execution necessarily evaluates each point with its own
requested parameters; the sequential driver remains the default for
quirk-exact sweeps.
"""
from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Sequence

import jax


def parallel_sweep(fn: Callable, points: Sequence, devices=None):
    """Evaluate ``fn(point)`` for every point, one device per in-flight point.

    Returns results in point order; exceptions propagate after all points
    finish (so one bad point doesn't strand the rest mid-flight).
    """
    devices = list(devices) if devices is not None else jax.devices()

    def run_one(args):
        idx, point = args
        dev = devices[idx % len(devices)]
        with jax.default_device(dev):
            return fn(point)

    with cf.ThreadPoolExecutor(max_workers=len(devices)) as pool:
        futures = [pool.submit(run_one, (i, p)) for i, p in enumerate(points)]
        done, _ = cf.wait(futures)
    return [f.result() for f in futures]
