"""Benchmark: FDTD cell-updates/s on the headline workload (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload (BASELINE.md table): 25x25 m grid at 750 Hz max frequency
(pv_ExtremeResolution) -> 193x193 solver cells x 1187 timesteps ~= 44M
cell-updates + a full [T, nx, ny] f32 pressure recording per pass, then the
vectorized analyzer. The reference claims "real time on a single CPU core"
only for the *low* resolution sandbox config (README.md:24-25); the baseline
here is the NumPy oracle (tests/oracle.py) — a faithful vectorized CPU
implementation of the reference solver — timed on this host.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


from planeverb_tpu.utils.profiling import time_chained  # noqa: E402
# (chained-dependent-runs timing: honest on the tunneled TPU backend where
# block_until_ready does not block and identical runs can be relay-cached)


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "tests")
    import oracle

    from planeverb_tpu.config import (PlaneverbConfig, compute_grid_params,
                                      gaussian_pulse)
    from planeverb_tpu.ops import analyzer, fdtd, voxelize
    from planeverb_tpu.scene import demo_scene

    platform = jax.devices()[0].platform
    device = str(jax.devices()[0])

    cfg = PlaneverbConfig(grid_size_x=25.0, grid_size_y=25.0,
                          grid_resolution=750)
    params = compute_grid_params(cfg)
    scene = demo_scene("HugeRoom")
    beta_np, refl_np = voxelize.voxelize_np(params, scene.boxes)
    pulse_np = gaussian_pulse(params)
    lix, liy = params.world_to_cell(12.5, 12.5)

    beta = jnp.asarray(beta_np)
    refl = jnp.asarray(refl_np)
    pulse = jnp.asarray(pulse_np)

    cells = params.nx * params.ny
    T = params.response_length
    cell_updates = cells * T

    # --- device: fused Pallas sim + in-kernel analyzer moments
    from planeverb_tpu.ops.fdtd_pallas import pipeline_auto, simulate_auto

    def full_pass(eps):
        _, out = pipeline_auto(params, beta, refl, pulse * (1.0 + eps),
                               lix, liy, jnp.float32(1.0),
                               jnp.float32(12.5), jnp.float32(12.5))
        return out.occlusion[5, 5] + out.rt60[5, 5]

    float(np.asarray(full_pass(0.0)))  # compile + warm
    t_pipeline = time_chained(full_pass, reps=5)

    def sim_only(eps):
        res = simulate_auto(params, beta, refl, pulse * (1.0 + eps),
                            lix, liy)
        return res.pressure[T - 1, 5, 5]

    float(np.asarray(sim_only(0.0)))
    t_sim = time_chained(sim_only, reps=5)

    # --- baseline: NumPy oracle solver, per-step cost extrapolated from a
    # reduced-step run (the oracle's analyzer is a test-only per-cell Python
    # loop, so the solver is the comparable piece)
    import dataclasses as _dc

    grid = oracle.build_scene(cfg, scene)
    steps_probe = 40
    grid_small = _dc.replace(
        grid, params=_dc.replace(grid.params, response_length=steps_probe))
    t0 = time.perf_counter()
    oracle.generate_response(grid_small, 12.5, 12.5)
    t_oracle = (time.perf_counter() - t0) * (T / steps_probe)

    rate = cell_updates / t_sim
    rate_oracle = cell_updates / t_oracle

    result = {
        "metric": "fdtd_cell_updates_per_s",
        "value": round(rate),
        "unit": "cell-updates/s",
        "vs_baseline": round(rate / rate_oracle, 2),
        "platform": platform,
        "device": device,
        "grid": [params.nx, params.ny],
        "timesteps": T,
        "sim_wall_s": round(t_sim, 5),
        "pipeline_wall_s": round(t_pipeline, 5),
        "oracle_wall_s_est": round(t_oracle, 5),
        "workload": "25m@750Hz HugeRoom (sim+analyze; baseline=numpy oracle solver)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
