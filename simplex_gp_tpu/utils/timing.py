"""Honest device timing helpers.

``jax.block_until_ready`` can return before the computation has actually
finished on some remote-tunneled TPU runtimes (measured on v5e-via-axon:
a ~500 ms computation "blocks" in 0.1 ms, while a device-to-host transfer
of one scalar waits for the real work).  Every wall-clock measurement in
this framework therefore synchronizes by pulling one element of the result
back to the host.

The reference times its GPU path with CUDA events around the filter call
(experiments/mvm_err.py:20-41); this is the TPU-native moral equivalent.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["device_sync", "sync_time", "sync_floor"]


def device_sync(out) -> None:
    """Block until ``out`` (array or pytree) is actually computed."""
    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.ravel(leaf)[0])


def sync_time(f: Callable, *args, reps: int = 10, warmup: int = 1) -> float:
    """Median wall-clock seconds per call of ``f(*args)``, to-host-synced.

    Includes one device-to-host scalar transfer per rep; subtract
    :func:`sync_floor` for the pure-compute estimate.
    """
    for _ in range(max(1, warmup)):
        device_sync(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        device_sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def sync_floor(reps: int = 20) -> float:
    """Median seconds of a no-op dispatch + scalar to-host transfer."""
    tiny = jax.jit(lambda z: z + 1)
    z = jnp.zeros(())
    return sync_time(tiny, z, reps=reps)
