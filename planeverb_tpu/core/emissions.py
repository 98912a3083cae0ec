"""Emission registry: tracks positions of playing sounds.

Analog of /root/reference ProjectPlaneverb/src/Emissions/EmissionManager.cpp:
a vector of positions with free-list id reuse (EmissionManager.cpp:37-67).
Thread-safe by a single lock (the reference reads these unguarded from the
sim thread; we snapshot instead — SURVEY.md §5 race notes).
"""

from __future__ import annotations

import threading

__all__ = ["EmissionRegistry"]


class EmissionRegistry:
    def __init__(self):
        self._lock = threading.Lock()
        self._positions: list[tuple[float, float, float] | None] = []
        self._free: list[int] = []

    def emit(self, x: float, y: float, z: float) -> int:
        with self._lock:
            if self._free:
                eid = self._free.pop()
                self._positions[eid] = (x, y, z)
            else:
                eid = len(self._positions)
                self._positions.append((x, y, z))
            return eid

    def update(self, eid: int, x: float, y: float, z: float) -> None:
        with self._lock:
            if 0 <= eid < len(self._positions) and self._positions[eid] is not None:
                self._positions[eid] = (x, y, z)

    def end(self, eid: int) -> None:
        with self._lock:
            if 0 <= eid < len(self._positions) and self._positions[eid] is not None:
                self._positions[eid] = None
                self._free.append(eid)

    def get(self, eid: int):
        with self._lock:
            if 0 <= eid < len(self._positions):
                return self._positions[eid]
            return None

    def snapshot(self) -> dict[int, tuple[float, float, float]]:
        with self._lock:
            return {i: p for i, p in enumerate(self._positions) if p is not None}

    def free_ids(self) -> list[int]:
        """The free-list stack, oldest-freed first (top = last element)."""
        with self._lock:
            return list(self._free)

    def restore(self, items: list[tuple[int, tuple[float, float, float]]],
                free: list[int] | None = None) -> None:
        """Replace contents with explicit (eid, position) pairs, preserving
        ids (session checkpoint/resume, planeverb_tpu.session). ``free``
        restores the free-list stack order so id reuse after resume matches
        the uncheckpointed session."""
        with self._lock:
            n = max((eid for eid, _ in items), default=-1) + 1
            self._positions = [None] * n
            for eid, pos in items:
                self._positions[eid] = tuple(pos)
            holes = {i for i in range(n) if self._positions[i] is None}
            if free is not None and set(free) == holes:
                self._free = list(free)
            else:
                self._free = sorted(holes)
