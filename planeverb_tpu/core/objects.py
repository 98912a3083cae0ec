"""Game-object runtime: 3D objects auto-synced into the 2D solver slice.

The reference's engine-side per-frame component is PlaneverbObject
(/root/reference UnityDemo .../PlaneverbUnityPluginAPI/PlaneverbObject.cs):
every frame it merges its child collider bounds (GetMaxBounds, :184-192),
tests whether the merged box spans the listener's head height
(IsWithinPlayerHeadSlice, :194-200), and drives Add/Update/RemoveGeometry
accordingly (:93-118) — objects outside the head slice are culled from the
simulation entirely. CalculateAABB (:163-180) projects the surviving 3D box
onto the (x, z) solver plane, shaving SIZE_EPSILON so a box that exactly
abuts a cell boundary doesn't paint the extra row.

:class:`ObjectManager` is that component system as one registry: objects
hold world-space 3D bounds (one box or merged children) + a material, and
``sync()`` performs every object's per-frame Update against the context's
current listener height. Game loops call ``sync()`` once per frame (or let
``Context.step`` drive it via ``attach``).
"""

from __future__ import annotations

import dataclasses
import threading

from planeverb_tpu.scene import AABB, AABB3D, merge_bounds

__all__ = ["ObjectManager", "SIZE_EPSILON"]

SIZE_EPSILON = 0.01  # PlaneverbObject.cs:73 — shaved off projected extents


@dataclasses.dataclass
class _ObjectRecord:
    bounds: AABB3D
    gid: int | None = None       # geometry id while inside the head slice


class ObjectManager:
    """Tracks 3D game objects and mirrors the in-slice ones into the
    context's geometry registry (PlaneverbObject component system)."""

    def __init__(self, ctx):
        self.ctx = ctx
        self._lock = threading.Lock()
        self._objects: dict[int, _ObjectRecord] = {}
        self._next = 0

    # -------------------------------------------------------------- objects
    def add(self, bounds, absorption: float | None = None) -> int:
        """Register an object. ``bounds`` is an AABB3D or an iterable of
        child-collider AABB3Ds (merged like GetMaxBounds,
        PlaneverbObject.cs:184-192). Returns an object id (not a geometry
        id — the geometry binding tracks head-slice membership)."""
        box = self._merge(bounds, absorption)
        with self._lock:
            oid = self._next
            self._next += 1
            self._objects[oid] = _ObjectRecord(bounds=box)
        self.sync()
        return oid

    def update(self, oid: int, bounds, absorption: float | None = None) -> None:
        """Move/resize an object (the per-frame transform change path)."""
        box = self._merge(bounds, absorption)
        with self._lock:
            rec = self._objects.get(oid)
            if rec is None:
                raise KeyError(f"no object id {oid}")
            rec.bounds = box
        self.sync()

    def remove(self, oid: int) -> None:
        """OnDestroy analog (PlaneverbObject.cs:157-163)."""
        with self._lock:
            rec = self._objects.pop(oid, None)
        if rec is not None and rec.gid is not None:
            self.ctx.geometry.remove(rec.gid)

    def get_bounds(self, oid: int) -> AABB3D | None:
        with self._lock:
            rec = self._objects.get(oid)
            return rec.bounds if rec is not None else None

    def in_head_slice(self, oid: int) -> bool:
        with self._lock:
            rec = self._objects.get(oid)
            return rec is not None and rec.gid is not None

    # ------------------------------------------------------------ per frame
    def sync(self) -> dict:
        """Every object's per-frame Update (PlaneverbObject.cs:93-118):
        in-slice objects are added/updated in the geometry registry,
        out-of-slice ones removed. Returns {"added": n, "updated": n,
        "removed": n, "culled": n}."""
        _, listener_y, _ = self.ctx.get_listener_position()
        stats = {"added": 0, "updated": 0, "removed": 0, "culled": 0}
        with self._lock:
            for rec in self._objects.values():
                b = rec.bounds
                spans = (b.y - b.height * 0.5 <= listener_y
                         <= b.y + b.height * 0.5)
                if spans:
                    box = AABB(b.x, b.z,
                               max(b.width - SIZE_EPSILON, 0.0),
                               max(b.depth - SIZE_EPSILON, 0.0),
                               b.absorption)
                    if rec.gid is None:
                        rec.gid = self.ctx.geometry.add(box)
                        stats["added"] += 1
                    else:
                        self.ctx.geometry.update(rec.gid, box)
                        stats["updated"] += 1
                elif rec.gid is not None:
                    self.ctx.geometry.remove(rec.gid)
                    rec.gid = None
                    stats["removed"] += 1
                else:
                    stats["culled"] += 1
        return stats

    @staticmethod
    def _merge(bounds, absorption: float | None) -> AABB3D:
        if isinstance(bounds, AABB3D):
            if absorption is not None:
                bounds = dataclasses.replace(bounds, absorption=absorption)
            return bounds
        return merge_bounds(bounds, absorption)
