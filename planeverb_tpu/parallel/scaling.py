"""Halo-exchange scaling-efficiency harness (BASELINE.md north-star metric).

Measures wall-clock per simulation pass for the sharded solver on growing
device counts over the same *global* grid (strong scaling), reporting

    efficiency(n) = t(1 device) / (n * t(n devices))

On a real TPU slice/pod this is the ">=80% halo-exchange scaling efficiency"
number from BASELINE.md; on the 8-device virtual CPU mesh it exercises the
identical program (collectives included) and validates the harness itself —
virtual-device timings share one physical socket, so treat those numbers as
plumbing checks, not performance.

Usage:  python -m planeverb_tpu scale [--grid 50] [--resolution 275] ...
"""

from __future__ import annotations

import numpy as np

from planeverb_tpu.utils.profiling import time_chained

__all__ = ["measure_scaling", "projected_efficiency"]

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


def projected_efficiency(grid_x: int, grid_y: int, device_counts,
                         rate_ext_cups: float, halos=(8, 16, 32),
                         chips_per_host: int = 8) -> list[dict]:
    """Model halo-exchange strong-scaling efficiency for an N-chip mesh.

    ``rate_ext_cups``: measured extended-cell updates/s of the sharded
    round kernel on ONE chip — ``ext_cells * T / wall`` from the
    ``sharded_pallas_1x1`` bench row, where ``ext_cells`` counts the
    (block + 2*halo)^2 cells the kernel actually updates. Using the
    extended rate makes the model charge the ghost-compute overhead of
    small shards explicitly (the dominant cost at high N).

    Per device count the model searches mesh factorizations and halo
    periods and reports the best:

      t_round(N, mx, my, k) = ext_cells/chip * k / rate
                              + sum over axes of slab/BW + latency
      efficiency(N) = t_round(1) / (N * t_round(N))   [same k as N's best]

    Communication charges DCN (bandwidth + latency) on axes that cross a
    host boundary (mesh axes are host-major), ICI otherwise; no
    compute/comm overlap is assumed (conservative). Returns one row per N.
    """
    def factorizations(n):
        out = []
        f = 1
        while f * f <= n:
            if n % f == 0:
                out += [(f, n // f), (n // f, f)]
            f += 1
        return sorted(set(out))

    def t_round(n, mx, my, k):
        bx = -(-grid_x // mx)
        by = -(-grid_y // my)
        if k > bx or k > by:
            return None, None
        ext = (bx + 2 * k) * (by + 2 * k)
        t_comp = ext * k / rate_ext_cups
        t_comm = 0.0
        # device order is x-major (device = x*my + y), hosts own contiguous
        # device ranges: y-neighbor pairs straddle a host boundary once my
        # exceeds a host, x-neighbor pairs once the x rows per host run out.
        # Only boundary chips pay DCN, but the stencil is synchronous, so a
        # crossing axis charges the whole round the DCN cost (max over chips).
        y_cross = my > chips_per_host
        x_cross = mx > max(1, chips_per_host // min(my, chips_per_host))
        for axis_n, edge, cross in ((mx, by, x_cross), (my, bx, y_cross)):
            if axis_n == 1:
                continue
            slab = _EXCHANGED_FIELDS * k * edge * 4
            bw = (V5E_DCN_GBPS if cross else V5E_ICI_GBPS) * 1e9
            lat = DCN_LATENCY_S if cross else ICI_LATENCY_S
            t_comm += slab / bw + lat
        return t_comp, t_comm

    rows = []
    for n in device_counts:
        best = None
        for mx, my in factorizations(n):
            for k in halos:
                tc, tx = t_round(n, mx, my, k)
                if tc is None:
                    continue
                t1c, _ = t_round(1, 1, 1, k)
                eff = t1c / (n * (tc + tx))
                if best is None or eff > best["efficiency"]:
                    best = {
                        "devices": n, "mesh": [mx, my], "halo": k,
                        "hosts": max(1, n // chips_per_host),
                        "t_comp_round_us": round(tc * 1e6, 1),
                        "t_comm_round_us": round(tx * 1e6, 1),
                        "efficiency": round(eff, 3),
                    }
        if best is not None:
            rows.append(best)
    return rows


def measure_scaling(params, beta, refl, pulse, lix, liy,
                    device_counts=None, halo: int = 8, reps: int = 3,
                    chain: int = 5, solver: str = "wide"):
    """Strong-scaling sweep of the sharded solver over sub-meshes.

    ``solver`` picks the backend: "wide" = lax.scan with k-step halo
    widening (parallel/solver.py), "pallas" = fused-kernel rounds between
    halo exchanges (parallel/solver_pallas.py — the TPU-rate path;
    interpret mode engages automatically off-TPU).

    Timing uses the chained-dependent-runs pattern (utils.profiling.
    time_chained): each pass perturbs the pulse with the previous pass's
    output and only the final scalar is fetched, so the numbers stay honest
    on the tunneled TPU backend where ``block_until_ready`` does not block
    and identical executions can be served from a relay cache.

    Returns a list of row dicts: {devices, mesh, wall_s, cell_updates_per_s,
    efficiency_vs_1}.
    """
    import jax
    import jax.numpy as jnp

    from planeverb_tpu.parallel.mesh import factor_mesh, grid_mesh, pad_to_mesh
    from planeverb_tpu.parallel.solver import simulate_sharded_wide
    from planeverb_tpu.parallel.solver_pallas import simulate_sharded_pallas

    if solver not in ("wide", "pallas"):
        raise ValueError(f"unknown solver {solver!r}")

    all_devices = jax.devices()
    if device_counts is None:
        device_counts = []
        n = 1
        while n <= len(all_devices):
            device_counts.append(n)
            n *= 2

    updates = params.nx * params.ny * params.response_length
    rows = []
    t1 = None
    for n in device_counts:
        mesh = grid_mesh(all_devices[:n], factor_mesh(n))
        nx_pad, ny_pad = pad_to_mesh(params.nx, params.ny, mesh)
        bp = jnp.zeros((nx_pad, ny_pad), jnp.float32).at[
            :params.nx, :params.ny].set(jnp.asarray(beta))
        rp = jnp.zeros((nx_pad, ny_pad), jnp.float32).at[
            :params.nx, :params.ny].set(jnp.asarray(refl))
        pu = jnp.asarray(pulse)
        k = min(halo, nx_pad // mesh.shape["x"], ny_pad // mesh.shape["y"])
        qx, qy = params.nx // 2, params.ny // 2

        if solver == "pallas":
            interp = mesh.devices.flat[0].platform != "tpu"

            def one_pass(eps, mesh=mesh, bp=bp, rp=rp, pu=pu, k=k,
                         nx_pad=nx_pad, ny_pad=ny_pad):
                res = simulate_sharded_pallas(
                    params, bp, rp, pu * (1.0 + eps), jnp.int32(lix),
                    jnp.int32(liy), mesh, nx_pad, ny_pad, halo=k,
                    interpret=interp)
                return res.pressure[params.response_length - 1, qx, qy]
        else:
            def one_pass(eps, mesh=mesh, bp=bp, rp=rp, pu=pu, k=k,
                         nx_pad=nx_pad, ny_pad=ny_pad):
                res = simulate_sharded_wide(
                    params, bp, rp, pu * (1.0 + eps), jnp.int32(lix),
                    jnp.int32(liy), mesh, nx_pad, ny_pad, halo=k)
                return res.pressure[params.response_length - 1, qx, qy]

        float(np.asarray(one_pass(0.0)))  # compile + warm
        t = time_chained(one_pass, n=chain, reps=reps)
        if t1 is None:
            t1 = t * n  # normalize in case the sweep starts above 1 device
        rows.append({
            "devices": n,
            "solver": solver,
            "mesh": [mesh.shape["x"], mesh.shape["y"]],
            "halo": k,
            "wall_s": round(t, 5),
            "cell_updates_per_s": round(updates / t),
            "efficiency_vs_1": round(t1 / (n * t), 4),
        })
    return rows
