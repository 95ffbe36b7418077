"""Sweep-level scale-out: independent experiment points across devices.

The reference's sweep loop (main.py:176-240) is embarrassingly parallel
across (approach, variable_value) points — SURVEY.md §5.8 maps this to
DCN-level scale-out across slices.  On a single host this runs one point per
device (threads + ``jax.default_device``); across hosts the same function
shape applies with one process per slice.

Semantics note: the reference mutates ``params["noise_rate"]`` with the
measured rate across sweep iterations (main.py:196, an order-dependent
quirk).  main.run_experiment(parallel=True) makes the parallel sweep
QUIRK-EXACT anyway via its two-phase design: a cheap sequential data-only
pass first chains the measured rates through the sweep order, then the
engine points fan out here with their phase-1 params snapshots — parallel
results equal the sequential driver's exactly at any noise rate (tested).
"""
from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Sequence

import jax


def parallel_sweep(fn: Callable, points: Sequence, devices=None):
    """Evaluate ``fn(point)`` for every point, one device per in-flight point.

    Devices are checked out of a QUEUE per point (review r5: the old
    static idx %% p binding let an early-finishing slot start point p+i on
    a device still running point i while other devices idled — doubling
    one device's peak memory and serializing both points).  Returns
    results in point order; exceptions propagate after all points finish
    (so one bad point doesn't strand the rest mid-flight).
    """
    import queue as _queue
    devices = list(devices) if devices is not None else jax.devices()
    free: _queue.Queue = _queue.Queue()
    for d in devices:
        free.put(d)

    def run_one(point):
        dev = free.get()
        try:
            with jax.default_device(dev):
                return fn(point)
        finally:
            free.put(dev)

    with cf.ThreadPoolExecutor(max_workers=len(devices)) as pool:
        futures = [pool.submit(run_one, p) for p in points]
        cf.wait(futures)
    return [f.result() for f in futures]
