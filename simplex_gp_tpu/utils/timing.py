"""Honest, robust device timing helpers.

``jax.block_until_ready`` can return before the computation has actually
finished on some remote-tunneled TPU runtimes (measured on v5e-via-axon:
a ~500 ms computation "blocks" in 0.1 ms, while a device-to-host transfer
of one scalar waits for the real work).  Every wall-clock measurement in
this framework therefore synchronizes by pulling one element of the result
back to the host.

Two robustness properties, both learned from production runs on the
tunneled TPU runtime:

  * **Transient-error retry.**  The runtime intermittently raises
    ``FAILED_PRECONDITION`` / ``UNAVAILABLE`` during device init or the
    first transfers (device contention on the shared tunnel).  All sync
    points retry with exponential backoff instead of crashing the
    benchmark (round-1 driver bench died on the FIRST scalar transfer).
  * **On-device rep chaining.**  A single dispatch+transfer floor is
    ~5-30 ms on this runtime -- the same magnitude as the measured filter.
    :func:`sync_time_chained` runs R dependent repetitions inside ONE
    jitted ``lax.fori_loop`` and divides, so the floor is amortized 1/R
    instead of being subtracted at full strength.

The reference times its GPU path with CUDA events around the filter call
(experiments/mvm_err.py:20-41); this is the TPU-native moral equivalent.
"""

from __future__ import annotations

import statistics
import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "device_sync",
    "sync_time",
    "sync_floor",
    "sync_time_chained",
    "warmup_device",
    "with_retries",
]

# Substrings of transient runtime errors worth retrying (device init /
# tunnel contention), vs real bugs which should propagate immediately.
_TRANSIENT = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED: Attempting to reserve",
    "ABORTED",
)


def _is_transient(err: Exception) -> bool:
    s = f"{type(err).__name__}: {err}"
    return any(t in s for t in _TRANSIENT)


# Monotone counter of transient-error retries across all sync points.
# Timing loops snapshot it around each rep: a rep during which a retry
# happened contains up to ~120 s of backoff sleep and must be discarded,
# not averaged in (r2 advisor finding).
_RETRY_COUNT = 0


def with_retries(fn: Callable, deadline_s: float = 600.0, what: str = "op"):
    """Run ``fn()`` retrying transient runtime errors with backoff.

    Raises the last error once ``deadline_s`` of wall clock is spent.
    Progress goes to stderr so driver logs show liveness.
    """
    global _RETRY_COUNT
    t0 = time.monotonic()
    delay = 1.0
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - classify and re-raise below
            attempt += 1
            _RETRY_COUNT += 1
            elapsed = time.monotonic() - t0
            if not _is_transient(e) or elapsed + delay > deadline_s:
                raise
            print(
                f"[timing] transient error in {what} (attempt {attempt}, "
                f"{elapsed:.0f}s in): {type(e).__name__}; retrying in {delay:.0f}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(delay)
            delay = min(delay * 2.0, 60.0)


def device_sync(out, deadline_s: float = 120.0) -> None:
    """Block until ``out`` (array or pytree) is actually computed.

    Retries transient transfer errors (the computation result, once
    enqueued, survives a failed host transfer attempt).
    """
    for leaf in jax.tree.leaves(out):
        with_retries(
            lambda leaf=leaf: np.asarray(jnp.ravel(leaf)[0]),
            deadline_s=deadline_s,
            what="device_sync",
        )


def warmup_device(deadline_s: float = 900.0) -> float:
    """Force device init + one tiny compile, retrying transient failures.

    Returns the wall seconds spent.  Call this ONCE before any measurement:
    on the tunneled runtime, first contact can block for minutes when the
    chip is contended, and may fail transiently several times first.
    """
    t0 = time.monotonic()

    def touch():
        f = jax.jit(lambda z: z * 2.0 + 1.0)
        z = jnp.zeros((8, 128), jnp.float32)
        np.asarray(f(z))[0, 0]

    with_retries(touch, deadline_s=deadline_s, what="warmup")
    return time.monotonic() - t0


def sync_time(f: Callable, *args, reps: int = 10, warmup: int = 1) -> float:
    """Median wall-clock seconds per call of ``f(*args)``, to-host-synced.

    Includes one device-to-host scalar transfer per rep; subtract
    :func:`sync_floor` for the pure-compute estimate.  For measurements
    near the floor prefer :func:`sync_time_chained`.
    """
    for _ in range(max(1, warmup)):
        device_sync(with_retries(lambda: f(*args), what="sync_time warmup"))
    ts = []
    extra = 0
    while len(ts) < reps:
        before = _RETRY_COUNT
        t0 = time.perf_counter()
        device_sync(f(*args))
        dt = time.perf_counter() - t0
        if _RETRY_COUNT != before and extra < reps:
            # A transient-error retry slept inside this rep's timing window
            # (up to ~120 s of backoff): discard the rep and measure again.
            extra += 1
            print("[timing] discarding rep containing a transient retry", file=sys.stderr)
            continue
        ts.append(dt)
    return statistics.median(ts)


def sync_floor(reps: int = 20) -> float:
    """Median seconds of a no-op dispatch + scalar to-host transfer."""
    tiny = jax.jit(lambda z: z + 1)
    z = jnp.zeros(())
    return sync_time(tiny, z, reps=reps)


def sync_time_chained(
    step: Callable,
    init,
    chain: int = 8,
    reps: int = 5,
    floor: float = 0.0,
) -> float:
    """Seconds per application of ``step`` from ``chain`` dependent on-device reps.

    ``step(i, carry) -> carry`` is folded into one jitted ``lax.fori_loop``
    so a single host sync covers ``chain`` applications: the dispatch +
    transfer floor enters the per-rep estimate at 1/chain strength.  The
    carry dependence stops XLA from CSE/hoisting work out of the loop
    (callers must make each iteration's inputs depend on the carry).

    Returns median over ``reps`` timings of ``max(t - floor, 0) / chain``.
    """
    looped = jax.jit(
        lambda c0: jax.lax.fori_loop(0, chain, step, c0), static_argnums=()
    )
    device_sync(with_retries(lambda: looped(init), what="chained warmup"))
    ts = []
    extra = 0
    while len(ts) < reps:
        before = _RETRY_COUNT
        t0 = time.perf_counter()
        device_sync(looped(init))
        dt = time.perf_counter() - t0
        if _RETRY_COUNT != before and extra < reps:
            extra += 1  # rep polluted by transient-retry backoff sleep
            print("[timing] discarding rep containing a transient retry", file=sys.stderr)
            continue
        ts.append(dt)
    t = statistics.median(ts)
    return max(t - floor, 1e-9) / chain
