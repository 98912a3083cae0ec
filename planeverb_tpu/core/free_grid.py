"""Free-field calibration (FreeGrid analog).

At engine init the reference runs one full FDTD pass on an *empty* grid,
measures the energy of the response 1 m from the listener over the dry
window, and normalizes it to exactly 1 m via the 2D 1/r energy falloff
(/root/reference ProjectPlaneverb/src/FDTD/FreeGrid.cpp:71-110). The result
``EFree`` is the denominator for the analyzer's obstruction and wet-gain
normalization.

Here the same jitted solver runs on an empty field set; results are cached
per grid-parameter key so repeated engine construction (and tests) pay the
sim once per configuration.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from planeverb_tpu.config import GridParams, gaussian_pulse
from planeverb_tpu.ops import voxelize
from planeverb_tpu.ops.fdtd_pallas import simulate_auto

__all__ = ["calibrate_free_field", "clear_cache"]

_CACHE: dict[tuple, float] = {}


def _key(params: GridParams) -> tuple:
    return (params.resolution, params.grid_x, params.grid_y,
            params.response_length, params.boundary_type,
            params.grid_offset_x, params.grid_offset_y)


def calibrate_free_field(params: GridParams) -> float:
    """Compute (or fetch cached) EFree for this grid configuration."""
    key = _key(params)
    if key in _CACHE:
        return _CACHE[key]

    beta, refl = voxelize.base_fields(params)
    pulse = gaussian_pulse(params)

    lx = params.grid_x // 2
    ly = params.grid_y // 2
    emitter_x = lx + int(np.float32(1.0) / np.float32(params.dx))
    emitter_y = ly

    # listener world position is round-tripped through world_to_cell exactly
    # as the reference re-derives the cell from a world pos (FreeGrid.cpp:84)
    wx = float(np.float32(lx) * np.float32(params.dx))
    wy = float(np.float32(ly) * np.float32(params.dx))
    cix, ciy = params.world_to_cell(wx, wy)

    res = simulate_auto(params, jnp.asarray(beta), jnp.asarray(refl),
                        jnp.asarray(pulse), cix, ciy)
    sig = np.asarray(res.pressure[:, emitter_x, emitter_y])

    k = params.constants
    num_samples = (int(np.float32(k.dry_gain_analysis_length) * np.float32(params.fs))
                   + int(np.float32(1.0) / np.float32(k.c) * np.float32(params.fs)))
    efree = float(np.sum(sig[:num_samples].astype(np.float32) ** 2,
                         dtype=np.float32))

    r = np.float32(emitter_x - lx) * np.float32(params.dx)
    efree = float(np.float32(efree) * r)

    _CACHE[key] = efree
    return efree


def clear_cache() -> None:
    _CACHE.clear()
