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
           "time_chained", "time_chained_stats"]


def time_chained(fn, n: int = 10, reps: int = 3) -> float:
    """Per-pass wall time of fn via the paired-chain slope (median of reps).

    See :func:`time_chained_stats` for the methodology.
    """
    return time_chained_stats(fn, n, reps)["median_s"]


def _run_chain(fn, n: int, seed: float) -> float:
    """Wall time of one n-run dependent chain ending in a single fetch."""
    import numpy as np

    t0 = time.perf_counter()
    eps = seed
    for _ in range(n):
        eps = fn(eps) * 1e-6
    float(np.asarray(eps))  # single fetch drains the chain
    return time.perf_counter() - t0


def time_chained_stats(fn, n: int = 25, reps: int = 5) -> dict:
    """Per-pass wall time of fn as a PAIRED-CHAIN SLOPE, with spread:
    {"min_s", "median_s", "max_s", "reps", "chain"}.

    On the tunneled TPU backend ``block_until_ready`` returns immediately
    and identical executions may be served from a relay cache, so honest
    timing requires data dependence: ``fn(eps)`` must seed its input with
    ``eps`` and return a scalar jax value derived from its output; a chain
    feeds each output into the next input and fetches once at the end.

    A single chain's mean is NOT honest: the end-of-chain fetch costs a
    ~25-35 ms round-trip with ±10s-of-ms jitter (measured: a chained
    scalar no-op "costs" 2.7 ms/run at n=10 but 0.8 ms/run at n=40), which
    silently floors every per-run mean at roughly fetch/n. Every rep here
    therefore times a SHORT chain and a LONG chain (same fetch each) and
    takes the slope (T_long − T_short)/(n_long − n_short) — the fetch
    cancels. The headline is the MEDIAN of rep slopes (individual slopes
    still carry the fetch jitter; the min would chase it); min/max bound
    the spread. Distinct seeds per chain keep the relay cache out.
    """
    import numpy as np

    n_short = 2
    estimates = []
    for rep in range(reps):
        t_short = _run_chain(fn, n_short, 1e-3 * (2 * rep + 1))
        t_long = _run_chain(fn, n_short + n, 1e-3 * (2 * rep + 2))
        slope = (t_long - t_short) / n
        mean_long = t_long / (n_short + n)
        # the long-chain mean upper-bounds the true per-pass time (it
        # carries fetch/n); a slope outside (0, mean] is fetch jitter that
        # outweighed the chain delta — fall back to the mean for that rep
        estimates.append(slope if 0.0 < slope <= mean_long else mean_long)
    return {"min_s": float(np.min(estimates)),
            "median_s": float(np.median(estimates)),
            "max_s": float(np.max(estimates)),
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
