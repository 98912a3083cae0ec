"""2D FDTD acoustic wave solver — JAX reference implementation.

TPU-first re-design of the reference solver (semantics per
/root/reference ProjectPlaneverb/src/FDTD/FDTD.cpp:87-236):

  - SoA fields ``p/vx/vy`` as [nx, ny] float32 device arrays (the reference
    uses a 16-byte AoS ``Cell`` grid, PvTypes.h:106-121).
  - One fused update per timestep under ``lax.scan``: pressure, both velocity
    components with wall-admittance terms, first-order impedance absorbing
    edges, recording, and source injection at the *listener* cell (acoustic
    reciprocity: one sim yields the IR from every source cell to the listener).
  - Only the pressure field is recorded to HBM ([T, nx, ny] — 4 B/cell/step vs
    the reference's 16 B Cell record, FDTD.cpp:225-231). The analyzer
    quantities that need velocity (source-directivity flux, Analyzer.cpp:
    178-220) are accumulated *inside* the scan so vx/vy never touch HBM.
  - Onset delay (first |p| > -110 dB threshold, Analyzer.cpp:146-165) is also
    tracked in-scan as a streaming min.

The reference's flat-index loops wrap across row ends and read out of range;
all of those accesses are provably masked by ``beta == 0`` cells or
overwritten by the edge ABC before use, so this clean 2D formulation is
exactly equivalent (verified against the literal-semantics oracle in
tests/oracle.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from planeverb_tpu.config import BoundaryType, GridParams

__all__ = ["FdtdResult", "fdtd_step", "simulate", "admittance"]


class FdtdResult(NamedTuple):
    """Output of one simulation pass.

    pressure: [T, nx, ny] recorded pressure field (the impulse responses)
    onset:    [nx, ny] first sample where |p| crossed the audible threshold
              (float32; +inf where never crossed)
    flux_x:   [nx, ny] sum of p*vx over the source-directivity window
    flux_y:   [nx, ny] sum of p*vy over the source-directivity window
    """

    pressure: jax.Array
    onset: jax.Array
    flux_x: jax.Array
    flux_y: jax.Array


def admittance(reflection: jax.Array) -> jax.Array:
    """Wall admittance Y = (1-R)/(1+R) from reflection coefficient R
    (FDTD.cpp:158-159)."""
    return (1.0 - reflection) / (1.0 + reflection)


def fdtd_step(p, vx, vy, beta, Y, courant: float, gx: int, gy: int,
              absorbing: bool = True):
    """One fused FDTD timestep. Returns (p, vx, vy) post-update, post-edge-ABC.

    beta is the air flag (1 air / 0 wall) as float32; Y the admittance field.
    gx, gy are the analysis-grid dims (nx-1, ny-1), static.
    """
    # -- pressure update: p = beta * (p - C * div v)   (FDTD.cpp:124-141)
    vx_xp = jnp.pad(vx[1:], ((0, 1), (0, 0)))
    vy_yp = jnp.pad(vy[:, 1:], ((0, 0), (0, 1)))
    div = (vx_xp - vx) + (vy_yp - vy)
    p = beta * (p - courant * div)

    # -- vx update with rigid-wall beta factors and admittance cross terms
    #    neighbor is (x-1, y)                           (FDTD.cpp:143-170)
    p_xm = jnp.pad(p[:-1], ((1, 0), (0, 0)))
    b_xm = jnp.pad(beta[:-1], ((1, 0), (0, 0)))
    y_xm = jnp.pad(Y[:-1], ((1, 0), (0, 0)))
    air = vx - courant * (p - p_xm)
    y_bound = beta * y_xm + b_xm * Y
    wall = y_bound * (p_xm * b_xm + p * beta)
    vx_new = beta * b_xm * air + (b_xm - beta) * wall

    # -- vy update, neighbor (x, y-1)                   (FDTD.cpp:172-199)
    p_ym = jnp.pad(p[:, :-1], ((0, 0), (1, 0)))
    b_ym = jnp.pad(beta[:, :-1], ((0, 0), (1, 0)))
    y_ym = jnp.pad(Y[:, :-1], ((0, 0), (1, 0)))
    air = vy - courant * (p - p_ym)
    y_bound = beta * y_ym + b_ym * Y
    wall = y_bound * (p_ym * b_ym + p * beta)
    vy_new = beta * b_ym * air + (b_ym - beta) * wall

    # -- outer edge boundary condition                  (FDTD.cpp:201-223)
    ys = jnp.arange(p.shape[1])
    xs = jnp.arange(p.shape[0])
    if absorbing:
        # first-order impedance ABC: v = ±p on the four edges
        top = jnp.where(ys < gy, -p[0], 0.0)
        bot = jnp.where(ys < gy, p[gx - 1], 0.0)
        left = jnp.where(xs < gx, -p[:, 0], 0.0)
        right = jnp.where(xs < gx, p[:, gy - 1], 0.0)
    else:
        # rigid (fully reflecting) outer walls: v = 0. The reference declares
        # pv_ReflectingBoundary but never implements it (PvTypes.h:33-36).
        top = jnp.zeros_like(p[0])
        bot = jnp.zeros_like(p[0])
        left = jnp.zeros_like(p[:, 0])
        right = jnp.zeros_like(p[:, 0])

    vx = vx_new.at[0].set(top).at[gx].set(bot)
    vy = vy_new.at[:, 0].set(left).at[:, gy].set(right)
    return p, vx, vy


@functools.partial(jax.jit, static_argnames=("params",))
def simulate(params: GridParams, beta, reflection, pulse,
             listener_ix, listener_iy) -> FdtdResult:
    """Run one full simulation pass (GenerateResponse analog).

    Args:
      params: static grid parameters.
      beta: [nx, ny] float32 air flags.
      reflection: [nx, ny] float32 reflection coefficients R.
      pulse: [T] float32 source pulse.
      listener_ix, listener_iy: listener cell indices (traced int32 scalars).
    """
    nx, ny = params.nx, params.ny
    gx, gy = params.grid_x, params.grid_y
    courant = params.courant
    thr = jnp.float32(params.constants.audible_threshold_gain)
    src_dir_n = jnp.float32(params.source_dir_samples)
    absorbing = params.boundary_type == BoundaryType.ABSORBING

    Y = admittance(reflection)

    p0 = jnp.zeros((nx, ny), jnp.float32)
    v0 = jnp.zeros((nx, ny), jnp.float32)
    onset0 = jnp.full((nx, ny), jnp.inf, jnp.float32)
    flux0 = jnp.zeros((nx, ny), jnp.float32)

    def step(carry, xt):
        p, vx, vy, onset, fx, fy = carry
        t, pulse_t = xt
        p, vx, vy = fdtd_step(p, vx, vy, beta, Y, courant, gx, gy, absorbing)

        # streaming onset: first threshold crossing of the *recorded* pressure
        tf = t.astype(jnp.float32)
        onset = jnp.minimum(onset, jnp.where(jnp.abs(p) > thr, tf, jnp.inf))

        # streaming source-directivity flux over [0, onset + src_dir_n)
        # (Analyzer.cpp:178-193; inf onset => window still open)
        m = (tf < onset + src_dir_n).astype(jnp.float32)
        fx = fx + m * p * vx
        fy = fy + m * p * vy

        rec = p  # record after edge ABC, before source injection
        p = p.at[listener_ix, listener_iy].add(pulse_t)
        return (p, vx, vy, onset, fx, fy), rec

    ts = jnp.arange(params.response_length, dtype=jnp.int32)
    (_, _, _, onset, fx, fy), pressure = jax.lax.scan(
        step, (p0, v0, v0, onset0, flux0, flux0), (ts, pulse))

    return FdtdResult(pressure=pressure, onset=onset, flux_x=fx, flux_y=fy)
