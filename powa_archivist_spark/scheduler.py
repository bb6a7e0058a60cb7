"""Snapshot scheduler — the bgworker timer loop.

Reference: powa.c:331-505.  The loop is **drift-free**: the next wakeup
is computed as ``last_start += frequency`` (powa.c:499-503), never
``now() + frequency`` — a slow snapshot pass does not push every later
pass later.  When a pass overruns its slot the next one starts
immediately (the reference behaves the same: the latch wait gets a
non-positive timeout).

Clock and sleep are injectable for deterministic tests; production use
is ``run_loop(orch, server, capture_fn)``.
"""

from __future__ import annotations

import datetime as dt
import time
from collections.abc import Callable

from pyspark.sql import DataFrame

from .orchestrator import Orchestrator, ServerConfig


def run_loop(
    orch: Orchestrator,
    server: ServerConfig,
    capture_fn: Callable[[], dict[str, DataFrame]] | None = None,
    max_passes: int | None = None,
    clock: Callable[[], float] = time.time,
    sleep: Callable[[float], None] = time.sleep,
    on_error: Callable[[int, list[str]], None] | None = None,
) -> list[float]:
    """Run snapshot passes at ``server.frequency_s`` cadence.

    Returns the scheduled start times (epoch seconds) of each executed
    pass — for a healthy loop these are exact multiples of the frequency
    from the first start, regardless of per-pass duration."""
    if server.frequency_s <= 0:
        raise ValueError("server has snapshots disabled (frequency <= 0)")
    starts: list[float] = []
    next_start = clock()
    passes = 0
    while max_passes is None or passes < max_passes:
        starts.append(next_start)
        # stamp snapshots with the ACTUAL execution time, not the grid
        # slot: the reference's powa_take_snapshot uses now() at
        # execution, and diff/rate reads divide counter deltas by the
        # ts interval — a pass catching up after an overrun samples
        # near-now counters, so a grid-time stamp would warp every rate
        # around the hiccup.  Only the WAKEUP schedule is drift-free.
        now = dt.datetime.fromtimestamp(clock(), tz=dt.timezone.utc)
        captures = capture_fn() if capture_fn else {}
        n_err = orch.take_snapshot(server, captures=captures, now=now)
        if n_err and on_error:
            on_error(n_err, orch.read_metas(server.srvid)["errors"])
        passes += 1
        next_start += server.frequency_s  # drift-free (powa.c:499-503)
        delay = next_start - clock()
        if delay > 0:
            sleep(delay)
        # behind schedule: start the next pass immediately, keeping the
        # original grid so one slow pass cannot shift the cadence
    return starts
