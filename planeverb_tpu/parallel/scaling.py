"""Halo-exchange scaling-efficiency harness (BASELINE.md north-star metric).

Measures wall-clock per simulation pass for the sharded solver on growing
device counts, in two modes:

  strong: the global grid is fixed, shards shrink —
          efficiency(n) = t(1) / (n * t(n));
  weak:   the per-chip block is fixed, the world grows with the mesh
          (the actual deployment shape for "bigger worlds") —
          efficiency(n) = t(1) / t(n), ideal = a flat wall.

On a real TPU slice/pod this is the ">=80% halo-exchange scaling efficiency"
number from BASELINE.md; on the 8-device virtual CPU mesh it exercises the
identical program (collectives included) and validates the harness itself —
virtual-device timings share one physical socket, so treat those numbers as
plumbing checks, not performance. The projected_* functions model pod-scale
counts from the one-chip calibration row, including the r5 overlap round
split (solver_pallas._overlap_impl).

Usage:  python -m planeverb_tpu scale [--grid 50] [--weak] [--project] ...
"""

from __future__ import annotations

import numpy as np

from planeverb_tpu.utils.profiling import time_chained

__all__ = ["measure_scaling", "projected_efficiency",
           "projected_weak_efficiency"]

# ---------------------------------------------------------------------------
# Projected multi-chip efficiency model (BASELINE.md "Projected scaling").
#
# One chip cannot measure a pod, but every input of the round structure is
# measurable on one chip + public interconnect specs:
#   - compute: the sharded round kernel's measured EXTENDED-cell rate
#     (ghost rows included), calibrated so the model reproduces the 1x1
#     measured wall exactly;
#   - communication: per round each shard ppermutes 3 field slabs
#     (p/vx/vy) of halo x edge x 4 B per mesh axis, riding ICI inside a
#     host and DCN across hosts (the collective structure the 8-device
#     dryrun validates).
# Constants (stated assumptions, not measurements):
V5E_ICI_GBPS = 45.0    # ~usable GB/s per ICI link direction (v5e: 4 links,
                       # 1600 Gbps aggregate public spec)
V5E_DCN_GBPS = 25.0    # 200 Gbps host NIC, per direction
ICI_LATENCY_S = 2e-6   # ppermute slab launch + hop
DCN_LATENCY_S = 10e-6  # host-boundary RTT component
_EXCHANGED_FIELDS = 3  # p, vx, vy (parallel/solver.py::_exchange_halo)


def _factorizations(n):
    out = []
    f = 1
    while f * f <= n:
        if n % f == 0:
            out += [(f, n // f), (n // f, f)]
        f += 1
    return sorted(set(out))


def _axis_comm(mx, my, k, bx, by, chips_per_host):
    """Per-round exchange cost per axis.

    Device order is x-major (device = x*my + y), hosts own contiguous
    device ranges: y-neighbor pairs straddle a host boundary once my
    exceeds a host, x-neighbor pairs once the x rows per host run out.
    Only boundary chips pay DCN, but the stencil is synchronous, so a
    crossing axis charges the whole round the DCN cost (max over chips).
    Returns (t_comm_x, t_comm_y)."""
    y_cross = my > chips_per_host
    x_cross = mx > max(1, chips_per_host // min(my, chips_per_host))
    out = []
    for axis_n, edge, cross in ((mx, by, x_cross), (my, bx, y_cross)):
        if axis_n == 1:
            out.append(0.0)
            continue
        slab = _EXCHANGED_FIELDS * k * edge * 4
        bw = (V5E_DCN_GBPS if cross else V5E_ICI_GBPS) * 1e9
        lat = DCN_LATENCY_S if cross else ICI_LATENCY_S
        out.append(slab / bw + lat)
    return out[0], out[1]


# Round-structure calibration (r5, v5e): device walls of 1x1 halo sweeps
# fit t_round = lane_padded_cells*k/rate + C. Cells are counted with the
# kernel's LANE PADDING (the window's y extent rounds up to 128 — a
# 192-lane block computes 256 lanes), which the model reproduces per
# candidate shard shape so lane-aligned blocks aren't overcharged; on
# padded cells the sweeps fit rate ~= 52-59 G cells/s and C ~= 1.7-2.9 us
# (manual refit 58.5 G/2.89 us; bench lstsq fits land in-band —
# BASELINE.md "round-structure fit"). Defaults take the consensus
# midpoint; CLI/tests reference these constants so a recalibration
# updates one site.
ROUND_OVERHEAD_S = 2.4e-6
ROUND_RATE_CUPS = 56.0e9


def _lanes(n):
    """y extents round up to the TPU lane width inside the kernels."""
    return -(-n // 128) * 128


def _t_round(mx, my, k, bx, by, rate, chips_per_host, overlap,
             c_round=ROUND_OVERHEAD_S):
    """One round's modeled wall for a (bx, by)-cell shard on an (mx, my)
    mesh. Returns (t_comp, t_comm, extras) or (None, None, None) when the
    configuration is invalid.

    Compute is the r5 TWO-parameter calibration: window cells — with the
    kernel's lane padding (:func:`_lanes`) — advance at the asymptotic
    ``rate`` plus a fixed ``c_round`` per kernel launch (launch + state
    round-trip). A single k-dependent rate made small halos look
    spuriously cheap, and unpadded cell counting overcharged lane-aligned
    shards ~33 %; the hardware halo sweeps pin both parameters (see
    ROUND_OVERHEAD_S / ROUND_RATE_CUPS).

    Plain rounds (r5 per-axis ghosts, matching solver_pallas): the kernel
    advances the (bx + 2k·[mx>1]) x (by + 2k·[my>1]) extended block, then
    waits out the whole exchange — t = t_comp + t_comm.

    Overlap rounds (1D x-meshes only, solver_pallas._overlap_impl /
    _overlap_banded_impl): two 3k-row frame windows advance first (one
    launch), the frame ppermute then runs CONCURRENTLY with the bx-row
    interior launch — t = t_frame + max(t_comm, t_interior). Communication
    vanishes from the round whenever it is shorter than the interior
    advance; the price is the frame split's extra doomed-fringe compute
    (6k rows/round vs the plain 1D rounds' 2k ghost rows) plus one extra
    launch overhead."""
    if k > bx or k > by:
        return None, None, None
    tx, ty = _axis_comm(mx, my, k, bx, by, chips_per_host)
    if not overlap or (mx == 1 and my == 1):
        # (the solver's overlap path falls through to the plain rounds on
        # a single shard — nothing to exchange)
        kx = k if mx > 1 else 0
        ky = k if my > 1 else 0
        ext = (bx + 2 * kx) * _lanes(by + 2 * ky)
        return ext * k / rate + c_round, tx + ty, {}
    if my != 1 or bx < 3 * k:
        # overlap is implemented for 1D ("x", N) meshes only (fused AND
        # banded round kernels — _overlap_impl / _overlap_banded_impl);
        # the model mirrors the implementation (solver_pallas raises on
        # other mesh shapes)
        return None, None, None
    t_frame = 2 * (3 * k * _lanes(by)) * k / rate + c_round
    t_int = bx * _lanes(by) * k / rate + c_round
    t_comp = t_frame + max(tx, t_int)
    return t_comp, 0.0, {
        "t_frame_round_us": round(t_frame * 1e6, 1),
        "t_interior_round_us": round(t_int * 1e6, 1),
        "t_exchange_round_us": round(tx * 1e6, 1),
        "comm_hidden": tx <= t_int,
    }


def projected_efficiency(grid_x: int, grid_y: int, device_counts,
                         rate_ext_cups: float, halos=(8, 16, 32),
                         chips_per_host: int = 8,
                         overlap: bool = False,
                         round_overhead_s: float = ROUND_OVERHEAD_S
                         ) -> list[dict]:
    """Model halo-exchange strong-scaling efficiency for an N-chip mesh.

    ``rate_ext_cups``: the round kernel's ASYMPTOTIC cell rate (r5
    two-parameter calibration — the ``bench.py round_structure`` halo
    sweep fits ``t_round = cells*k/rate + round_overhead_s`` on one chip;
    ~42 G + 2.4 us consensus across three v5e sweeps, cells counted
    unpadded as the model counts them). The model charges each candidate
    mesh its
    per-axis ghost compute at that rate plus the fixed per-launch
    overhead, making BOTH dominant high-N costs — small-shard ghost
    compute and per-round machinery — explicit.

    Per device count the model searches mesh factorizations and halo
    periods and reports the best:

      t_round(N, mx, my, k) = ext_cells/chip * k / rate  (+ comm; see
                              _t_round — overlap=True hides comm behind
                              the interior kernel on 1D meshes)
      efficiency(N) = t_round(1) / (N * t_round(N))   [same k as N's best]

    Communication charges DCN (bandwidth + latency) on host-crossing
    axes, ICI otherwise. ``overlap=True`` models the r5 boundary-first
    round split (solver_pallas._overlap_impl) and restricts the mesh
    search to its implemented shape (1D x-meshes). Returns one row per N.
    """
    rows = []
    for n in device_counts:
        best = None
        for mx, my in _factorizations(n):
            for k in halos:
                bx = -(-grid_x // mx)
                by = -(-grid_y // my)
                tc, tx, extras = _t_round(mx, my, k, bx, by, rate_ext_cups,
                                          chips_per_host, overlap,
                                          round_overhead_s)
                if tc is None:
                    continue
                t1c, _, _ = _t_round(1, 1, k, grid_x, grid_y,
                                     rate_ext_cups, chips_per_host, overlap,
                                     round_overhead_s)
                eff = t1c / (n * (tc + tx))
                if best is None or eff > best["efficiency"]:
                    best = {
                        "devices": n, "mesh": [mx, my], "halo": k,
                        "hosts": max(1, n // chips_per_host),
                        "t_comp_round_us": round(tc * 1e6, 1),
                        "t_comm_round_us": round(tx * 1e6, 1),
                        "efficiency": round(eff, 3),
                        **extras,
                    }
        if best is not None:
            rows.append(best)
    return rows


def projected_weak_efficiency(block_x: int, block_y: int, device_counts,
                              rate_ext_cups: float, halos=(8, 16, 32),
                              chips_per_host: int = 8,
                              overlap: bool = False,
                              round_overhead_s: float = ROUND_OVERHEAD_S
                              ) -> list[dict]:
    """Weak-scaling companion of :func:`projected_efficiency`: the
    PER-CHIP block stays fixed at (block_x, block_y) cells — the world
    grows with the machine, which BASELINE.md names as the actual
    deployment shape for "bigger worlds" — and

      efficiency(N) = t_round(1 chip) / t_round(N chips)

    (no 1/N factor: per-chip work is constant, so ideal scaling is a
    flat wall). Ghost compute no longer grows with N (the block doesn't
    shrink), so the model isolates the pure communication cost — and
    with ``overlap=True`` the exchange hides behind the interior kernel
    whenever it is shorter, making weak scaling the regime where >=80%
    at many hosts is structurally easy. Returns one row per N with the
    best (mesh, halo)."""
    rows = []
    for n in device_counts:
        best = None
        for mx, my in _factorizations(n):
            for k in halos:
                tc, tx, extras = _t_round(mx, my, k, block_x, block_y,
                                          rate_ext_cups, chips_per_host,
                                          overlap, round_overhead_s)
                if tc is None:
                    continue
                t1c, _, _ = _t_round(1, 1, k, block_x, block_y,
                                     rate_ext_cups, chips_per_host, overlap,
                                     round_overhead_s)
                eff = t1c / (tc + tx)
                if best is None or eff > best["efficiency"]:
                    best = {
                        "devices": n, "mesh": [mx, my], "halo": k,
                        "hosts": max(1, n // chips_per_host),
                        "global_grid": [mx * block_x, my * block_y],
                        "t_comp_round_us": round(tc * 1e6, 1),
                        "t_comm_round_us": round(tx * 1e6, 1),
                        "efficiency": round(eff, 3),
                        **extras,
                    }
        if best is not None:
            rows.append(best)
    return rows


def measure_scaling(params, beta, refl, pulse, lix, liy,
                    device_counts=None, halo: int = 8, reps: int = 3,
                    chain: int = 5, solver: str = "wide",
                    mode: str = "strong", overlap: bool = False):
    """Scaling sweep of the sharded solver over sub-meshes.

    ``mode="strong"`` (default): the GLOBAL grid is fixed and shards
    shrink with the device count; efficiency(n) = t(1) / (n * t(n)).
    ``mode="weak"``: the PER-CHIP block is fixed at the given params'
    grid and the world grows with the mesh (the deployment shape for
    "bigger worlds", BASELINE.md); efficiency(n) = t(1) / t(n) — ideal
    weak scaling is a flat wall. Weak rows run an empty world at the
    base response length (geometry never changes the solver's per-cell
    cost, and a fixed T keeps per-chip work identical across sizes).

    ``solver`` picks the backend: "wide" = lax.scan with k-step halo
    widening (parallel/solver.py), "pallas" = fused-kernel rounds between
    halo exchanges (parallel/solver_pallas.py — the TPU-rate path;
    interpret mode engages automatically off-TPU). ``overlap=True``
    (pallas backend) runs the r5 boundary-first round split on 1D
    ("x", N) meshes — the sweep then uses (n, 1) factorizations and
    clamps the halo so shards satisfy the split's bx >= 3*halo
    precondition.

    Timing uses the chained-dependent-runs pattern (utils.profiling.
    time_chained): each pass perturbs the pulse with the previous pass's
    output and only the final scalar is fetched, so the numbers stay honest
    on the tunneled TPU backend where ``block_until_ready`` does not block
    and identical executions can be served from a relay cache.

    Returns a list of row dicts: {devices, mesh, wall_s, cell_updates_per_s,
    efficiency_vs_1}.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from planeverb_tpu.config import PlaneverbConfig, compute_grid_params
    from planeverb_tpu.ops import voxelize
    from planeverb_tpu.parallel.mesh import factor_mesh, grid_mesh, pad_to_mesh
    from planeverb_tpu.parallel.solver import simulate_sharded_wide
    from planeverb_tpu.parallel.solver_pallas import simulate_sharded_pallas

    if solver not in ("wide", "pallas"):
        raise ValueError(f"unknown solver {solver!r}")
    if mode not in ("strong", "weak"):
        raise ValueError(f"unknown mode {mode!r}")
    if overlap and solver != "pallas":
        raise ValueError("overlap=True needs solver='pallas' (the round "
                         "split lives in solver_pallas)")

    all_devices = jax.devices()
    if device_counts is None:
        device_counts = []
        n = 1
        while n <= len(all_devices):
            device_counts.append(n)
            n *= 2

    rows = []
    t1 = None
    for n in device_counts:
        mesh = grid_mesh(all_devices[:n],
                         (n, 1) if overlap else factor_mesh(n))
        if mode == "weak":
            # grow the world with the mesh: per-chip block ~= the base grid
            mx_, my_ = mesh.shape["x"], mesh.shape["y"]
            cfg_n = PlaneverbConfig(
                grid_size_x=params.grid_size_x * mx_,
                grid_size_y=params.grid_size_y * my_,
                grid_resolution=params.resolution,
                grid_boundary_type=params.boundary_type)
            p_n = dataclasses.replace(compute_grid_params(cfg_n),
                                      response_length=params.response_length)
            b_n, r_n = voxelize.base_fields(p_n)
            cix, ciy = p_n.nx // 2, p_n.ny // 2
        else:
            p_n, b_n, r_n = params, beta, refl
            cix, ciy = int(lix), int(liy)
        nx_pad, ny_pad = pad_to_mesh(p_n.nx, p_n.ny, mesh)
        bp = jnp.zeros((nx_pad, ny_pad), jnp.float32).at[
            :p_n.nx, :p_n.ny].set(jnp.asarray(b_n))
        rp = jnp.zeros((nx_pad, ny_pad), jnp.float32).at[
            :p_n.nx, :p_n.ny].set(jnp.asarray(r_n))
        pu = jnp.asarray(pulse)
        k = min(halo, nx_pad // mesh.shape["x"], ny_pad // mesh.shape["y"])
        if overlap and mesh.shape["x"] > 1:
            # the split needs bx >= 3*halo (frame + fringe + frame)
            k = max(1, min(k, (nx_pad // mesh.shape["x"]) // 3))
        if solver == "pallas" and k > 16:
            # the round kernel's recording chunk is min(k, 16) and must
            # divide k — a clamped k like 23 would abort the sweep deep
            # in the solver; floor to a chunk-compatible multiple
            k = (k // 16) * 16
        qx, qy = p_n.nx // 2, p_n.ny // 2
        updates = p_n.nx * p_n.ny * p_n.response_length

        if solver == "pallas":
            interp = mesh.devices.flat[0].platform != "tpu"

            def one_pass(eps, p_n=p_n, mesh=mesh, bp=bp, rp=rp, pu=pu, k=k,
                         nx_pad=nx_pad, ny_pad=ny_pad, cix=cix, ciy=ciy,
                         qx=qx, qy=qy):
                res = simulate_sharded_pallas(
                    p_n, bp, rp, pu * (1.0 + eps), jnp.int32(cix),
                    jnp.int32(ciy), mesh, nx_pad, ny_pad, halo=k,
                    interpret=interp, overlap=overlap)
                return res.pressure[p_n.response_length - 1, qx, qy]
        else:
            def one_pass(eps, p_n=p_n, mesh=mesh, bp=bp, rp=rp, pu=pu, k=k,
                         nx_pad=nx_pad, ny_pad=ny_pad, cix=cix, ciy=ciy,
                         qx=qx, qy=qy):
                res = simulate_sharded_wide(
                    p_n, bp, rp, pu * (1.0 + eps), jnp.int32(cix),
                    jnp.int32(ciy), mesh, nx_pad, ny_pad, halo=k)
                return res.pressure[p_n.response_length - 1, qx, qy]

        float(np.asarray(one_pass(0.0)))  # compile + warm
        t = time_chained(one_pass, n=chain, reps=reps)
        if t1 is None:
            # normalize in case the sweep starts above 1 device
            t1 = t * (n if mode == "strong" else 1)
        eff = (t1 / (n * t)) if mode == "strong" else (t1 / t)
        rows.append({
            "devices": n,
            "solver": solver,
            "mode": mode,
            "overlap": overlap,
            "mesh": [mesh.shape["x"], mesh.shape["y"]],
            "grid": [p_n.nx, p_n.ny],
            "halo": k,
            "wall_s": round(t, 5),
            "cell_updates_per_s": round(updates / t),
            "efficiency_vs_1": round(eff, 4),
        })
    return rows
