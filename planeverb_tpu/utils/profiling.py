"""Per-stage timing + throughput accounting (ScopedTimer/PROFILE_* analog).

The reference gates RAII microsecond timers behind compile-time flags
(/root/reference PvDefinitions.h:31-58, Util/ScopedTimer.h). Here timing is
always collected (cheap) and surfaced as a structured dict; cell-updates/s
and recording-bandwidth metrics derive from the grid parameters, matching
the roofline accounting demanded by BASELINE.md.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["StageTimer", "Stats", "throughput", "device_trace",
           "time_chained"]


def time_chained(fn, n: int = 10, reps: int = 3) -> float:
    """Per-pass wall time of fn, measured as a chain of n dependent runs.

    On the tunneled TPU backend ``block_until_ready`` returns immediately and
    identical executions may be served from a relay cache, so honest timing
    requires data dependence: ``fn(eps)`` must seed its input with ``eps``
    and return a scalar jax value derived from its output; the chain feeds
    each output into the next input (forcing sequential device execution and
    unique programs) and fetches once at the end. Returns the best per-pass
    mean over ``reps`` chains.
    """
    return time_chained_stats(fn, n, reps)["min_s"]


def time_chained_stats(fn, n: int = 10, reps: int = 3) -> dict:
    """Like :func:`time_chained` but returns the per-chain spread, not just
    the best point: {"min_s", "median_s", "max_s", "reps", "chain"}.

    Each entry is a per-pass mean over one n-run chain; run-to-run swing on
    the tunneled backend measured up to ~30% between rounds (BENCH_r01 vs
    r02), so perf claims carry the whole spread.
    """
    import numpy as np

    means = []
    for rep in range(reps):
        t0 = time.perf_counter()
        eps = 1e-3 * (rep + 1)
        for _ in range(n):
            eps = fn(eps) * 1e-6
        float(np.asarray(eps))  # single fetch drains the chain
        means.append((time.perf_counter() - t0) / n)
    return {"min_s": float(np.min(means)),
            "median_s": float(np.median(means)),
            "max_s": float(np.max(means)),
            "reps": reps, "chain": n}


class Stats:
    """Rolling per-stage wall-clock stats."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.last: dict[str, float] = {}

    def record(self, stage: str, seconds: float) -> None:
        self.totals[stage] = self.totals.get(stage, 0.0) + seconds
        self.counts[stage] = self.counts.get(stage, 0) + 1
        self.last[stage] = seconds

    def mean(self, stage: str) -> float:
        c = self.counts.get(stage, 0)
        return self.totals.get(stage, 0.0) / c if c else 0.0

    def summary(self) -> dict:
        return {s: {"mean_s": self.mean(s), "last_s": self.last[s],
                    "count": self.counts[s]} for s in self.totals}


class StageTimer:
    def __init__(self, stats: Stats | None = None):
        self.stats = stats or Stats()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stats.record(name, time.perf_counter() - t0)


def throughput(params, seconds: float) -> dict:
    """Roofline accounting for one sim pass (BASELINE.md metrics)."""
    cells = params.nx * params.ny
    updates = cells * params.response_length
    rec_bytes = updates * 4  # f32 pressure recording
    return {
        "cell_updates": updates,
        "cell_updates_per_s": updates / seconds if seconds > 0 else 0.0,
        "recording_bytes": rec_bytes,
        "recording_gb_per_s": rec_bytes / seconds / 1e9 if seconds > 0 else 0.0,
    }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a block (inspect with
    TensorBoard / xprof). The TPU analog of the reference's PROFILE_SECTION
    macros."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
