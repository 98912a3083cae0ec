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

__all__ = ["measure_scaling"]


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
