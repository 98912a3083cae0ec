"""Acoustic parameter encoder — vectorized analysis post-pass.

TPU-first re-design of the reference's per-cell scan loops
(/root/reference ProjectPlaneverb/src/DSP/Analyzer.cpp:139-328): every stage
becomes a masked reduction over the recorded [T, nx, ny] pressure tensor,
vmapped/vectorized across all cells at once:

  - onset delay:        streaming min from the solver (Analyzer.cpp:146-165)
  - obstruction:        sqrt(Edry / (EFree/r)) with Edry a masked windowed
                        energy sum (Analyzer.cpp:170-219)
  - source directivity: -normalized flux, accumulated in-scan by the solver
                        (Analyzer.cpp:178-220)
  - lowpass cutoff:     -147 + 18390/(1+(r/12)^0.8) (Analyzer.cpp:226-230)
  - wet gain:           sqrt(Ewet/E1m) over 80 ms post-dry (Analyzer.cpp:234-247)
  - RT60:               backward Schroeder integral via reverse cumsum + the
                        closed-form regression (Analyzer.cpp:250-327)

Direction-of-arrival (pass 2) lives in ops/doa.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from planeverb_tpu.config import GridParams
from planeverb_tpu.ops.doa import encode_directions

__all__ = ["AnalyzerResults", "analyze", "free_field_normalizer"]


class AnalyzerResults(NamedTuple):
    """Per-cell acoustic parameters over the [grid_x, grid_y] analysis grid.

    Mirrors AnalyzerResult (Analyzer.h:13-21) as SoA device arrays.
    """

    occlusion: jax.Array           # [gx, gy] obstruction gain
    wet_gain: jax.Array            # [gx, gy]
    rt60: jax.Array                # [gx, gy] seconds
    lowpass: jax.Array             # [gx, gy] cutoff Hz
    direction: jax.Array           # [gx, gy, 2] listener-relative DOA
    source_directivity: jax.Array  # [gx, gy, 2] radiated unit vector
    delay_samples: jax.Array       # [gx, gy] onset (f32; +inf if none)


def free_field_normalizer(params: GridParams, listener_ix, listener_iy):
    """Per-cell EFree/r denominators (FreeGrid::GetEFreePerR, FreeGrid.cpp:41-59).

    Returns [gx, gy] of 1/r falloff factors (r in meters between cell and the
    listener *cell* indices); the caller multiplies by the calibrated EFree.
    r == 0 cells use falloff 1 (the reference returns EFree unchanged).
    """
    gx, gy = params.grid_x, params.grid_y
    dx = jnp.float32(params.dx)
    rr = jax.lax.broadcasted_iota(jnp.int32, (gx, gy), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (gx, gy), 1)
    # Distance in integer index space: ``i*dx - lix*dx`` in floats invites an
    # XLA FMA fusion that leaves a tiny nonzero residue at the listener cell,
    # blowing up 1/r — the integer difference keeps the r==0 test exact.
    di = (rr - listener_ix).astype(jnp.float32)
    dj = (cc - listener_iy).astype(jnp.float32)
    r = jnp.sqrt(di * di + dj * dj) * dx
    at_listener = (rr == listener_ix) & (cc == listener_iy)
    return jnp.where(at_listener, 1.0, 1.0 / jnp.where(at_listener, 1.0, r))


@functools.partial(jax.jit, static_argnames=("params",))
def analyze(params: GridParams, pressure, onset, flux_x, flux_y,
            efree, listener_x, listener_y) -> AnalyzerResults:
    """Encode per-cell acoustic parameters from one simulation pass.

    Args:
      params: static grid parameters.
      pressure: [T, nx, ny] recorded pressure (solver output).
      onset: [nx, ny] onset sample per cell (f32, +inf when none).
      flux_x, flux_y: [nx, ny] in-scan directivity flux sums.
      efree: scalar free-field energy at 1 m (calibration).
      listener_x, listener_y: listener world position (traced f32 scalars,
        grid offset NOT yet applied — applied here as in Analyzer.cpp:60-62).
    """
    gx, gy = params.grid_x, params.grid_y
    T = params.response_length
    fs = jnp.float32(params.fs)
    dry_n = params.dry_gain_samples
    wet_n = params.wet_gain_samples
    schro_off = params.schroeder_offset_samples

    lwx = listener_x + jnp.float32(params.grid_offset_x)
    lwy = listener_y + jnp.float32(params.grid_offset_y)

    # analysis grid = [0:gx, 0:gy] corner of the solver grid (Analyzer.cpp:74-84)
    p = pressure[:, :gx, :gy]
    onset = onset[:gx, :gy]
    fx = flux_x[:gx, :gy]
    fy = flux_y[:gx, :gy]

    found = jnp.isfinite(onset)
    onset_c = jnp.where(found, onset, 0.0)  # safe onset for window arithmetic

    sq = p * p
    t_idx = jax.lax.broadcasted_iota(
        jnp.int32, (T, 1, 1), 0).astype(jnp.float32)

    direct_end = onset_c + jnp.float32(dry_n)

    # -- dry energy over [0, onset + dry_n)  (Analyzer.cpp:181-196)
    e_dry = jnp.sum(sq * (t_idx < direct_end), axis=0)

    # -- obstruction = sqrt(Edry / (EFree/r))  (Analyzer.cpp:199-219)
    inv_dx = jnp.float32(1.0) / jnp.float32(params.dx)
    lix = (lwx * inv_dx).astype(jnp.int32)
    liy = (lwy * inv_dx).astype(jnp.int32)
    inv_r = free_field_normalizer(params, lix, liy)
    efree_per_r = efree * inv_r
    occlusion = jnp.sqrt(e_dry / efree_per_r)
    occlusion = jnp.where(found, occlusion, 0.0)

    # -- source directivity = -flux/|flux|  (Analyzer.cpp:222-228)
    norm = jnp.sqrt(fx * fx + fy * fy)
    inv_norm = -1.0 / jnp.where(norm > 0.0, norm, 1.0)
    sdir = jnp.stack([fx * inv_norm, fy * inv_norm], axis=-1)
    sdir = jnp.where(found[..., None], sdir, 0.0)

    # -- lowpass cutoff  (Analyzer.cpp:226-230)
    r_occ = 1.0 / jnp.maximum(0.001, occlusion)
    lowpass = -147.0 + 18390.0 / (1.0 + jnp.power(r_occ / 12.0, 0.8))
    lowpass = jnp.where(found, lowpass, 0.0)

    # -- wet gain over (direct_end, direct_end + wet_n]  (Analyzer.cpp:234-247)
    wet_start = direct_end + 1.0
    wet_mask = (t_idx >= wet_start) & (t_idx < wet_start + jnp.float32(wet_n))
    e_wet = jnp.sum(sq * wet_mask, axis=0)
    wet_gain = jnp.where(found, jnp.sqrt(e_wet / efree), 0.0)

    # -- RT60: backward Schroeder + closed-form linear regression
    #    (Analyzer.cpp:250-327). EDC[t] = sum_{j>=t} p[j]^2 via reverse cumsum.
    edc = jnp.cumsum(sq[::-1], axis=0)[::-1]
    y_db = 10.0 * jnp.log10(jnp.maximum(edc, jnp.float32(1e-37)))

    start = direct_end + 1.0                      # first regression sample
    end = jnp.float32(T - schro_off)              # one past last
    reg_mask = (t_idx >= start) & (t_idx < end)
    x_val = t_idx - start
    rn = end - start
    xmean = (rn - 1.0) * 0.5
    xsum = rn * xmean
    denom = (1.0 / 12.0) * rn * (rn * rn - 1.0)
    ysum = jnp.sum(jnp.where(reg_mask, y_db, 0.0), axis=0)
    xysum = jnp.sum(jnp.where(reg_mask, y_db * x_val, 0.0), axis=0)
    ymean = ysum / rn
    numerator = xysum - ymean * xsum - xmean * ysum + rn * xmean * ymean
    slope_db_per_sec = numerator / denom * fs
    rt60 = -60.0 / slope_db_per_sec
    rt60 = jnp.where(found, rt60, 0.0)

    delay = jnp.where(found, onset, jnp.float32(jnp.finfo(jnp.float32).max))

    # -- pass 2: direction via parallel delay-field descent (ops/doa.py)
    direction = encode_directions(params, occlusion, delay, lwx, lwy)

    return AnalyzerResults(
        occlusion=occlusion, wet_gain=wet_gain, rt60=rt60, lowpass=lowpass,
        direction=direction, source_directivity=sdir, delay_samples=delay)
