"""Fused Pallas FDTD kernel — the whole response in one kernel launch.

The lax.scan solver (ops/fdtd.py) is dispatch-bound on TPU: each of the
~435-3937 timesteps runs a handful of tiny VPU ops on ~50-200 KB fields, so
per-step launch overhead dominates (~33 us/step measured on v5e, ~3 GB/s
effective vs ~800 GB/s HBM). This kernel runs the *entire* timestep loop
inside one ``pallas_call``:

  - p/vx/vy live in VMEM scratch for all T steps — zero HBM traffic for the
    wave state (the reference re-reads its 16-byte Cell AoS grid from memory
    every step, FDTD.cpp:124-231).
  - the sequential grid iterates over timesteps; the per-step pressure record
    is the kernel's blocked output, so Mosaic double-buffers the VMEM->HBM
    writeback and overlaps it with the next step's stencil — the only HBM
    traffic is the unavoidable [T, nx, ny] impulse-response recording.
  - onset / directivity-flux accumulators are VMEM-resident outputs with a
    constant index map (written back once at the end).

Semantics are identical to ops/fdtd.py::simulate (reference
ProjectPlaneverb/src/FDTD/FDTD.cpp:87-236): update order, admittance wall
terms, first-order impedance edge ABC, record-then-inject reciprocity source.

Fields are padded to TPU tile alignment (8 sublanes x 128 lanes); padding
carries beta = 0 (solid) and provably stays silent, so outputs restricted to
the real region equal the unpadded solve. Use ``simulate_auto`` to pick this
kernel on TPU and the lax.scan path elsewhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planeverb_tpu.config import BoundaryType, GridParams
from planeverb_tpu.ops.fdtd import FdtdResult, admittance
from planeverb_tpu.ops import fdtd as fdtd_scan

__all__ = ["simulate_pallas", "simulate_auto", "pad_tile"]

_SUBLANE = 8
_LANE = 128


def pad_tile(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(scal_ref, beta_ref, y_ref, bxm_ref, yxm_ref, bym_ref, yym_ref,
            pulse_ref, rec_ref, onset_ref, fx_ref, fy_ref,
            p_ref, vx_ref, vy_ref,
            *, courant, thr, src_dir_n, gx, gy, absorbing, npx, npy,
            chunk, t_real):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        zeros = jnp.zeros((npx, npy), jnp.float32)
        p_ref[:] = zeros
        vx_ref[:] = zeros
        vy_ref[:] = zeros
        onset_ref[:] = jnp.full((npx, npy), jnp.inf, jnp.float32)
        fx_ref[:] = zeros
        fy_ref[:] = zeros

    beta = beta_ref[:]
    Y = y_ref[:]
    b_xm = bxm_ref[:]
    y_xm = yxm_ref[:]
    b_ym = bym_ref[:]
    y_ym = yym_ref[:]
    gi = jax.lax.broadcasted_iota(jnp.int32, (npx, npy), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (npx, npy), 1)
    lix = scal_ref[0, 0]
    liy = scal_ref[0, 1]
    src = ((gi == lix) & (gj == liy)).astype(jnp.float32)
    zrow = jnp.zeros((1, npy), jnp.float32)
    zcol = jnp.zeros((npx, 1), jnp.float32)

    def one_step(k, carry):
        p, vx, vy, onset, fx, fy = carry
        t = c * chunk + k

        # -- pressure: p = beta * (p - C * div v)     (FDTD.cpp:124-141)
        vx_xp = jnp.concatenate([vx[1:], zrow], axis=0)
        vy_yp = jnp.concatenate([vy[:, 1:], zcol], axis=1)
        div = (vx_xp - vx) + (vy_yp - vy)
        p = beta * (p - courant * div)

        # -- velocities with admittance wall terms    (FDTD.cpp:143-199)
        p_xm = jnp.concatenate([zrow, p[:-1]], axis=0)
        air = vx - courant * (p - p_xm)
        y_bound = beta * y_xm + b_xm * Y
        wall = y_bound * (p_xm * b_xm + p * beta)
        vx_new = beta * b_xm * air + (b_xm - beta) * wall

        p_ym = jnp.concatenate([zcol, p[:, :-1]], axis=1)
        air = vy - courant * (p - p_ym)
        y_bound = beta * y_ym + b_ym * Y
        wall = y_bound * (p_ym * b_ym + p * beta)
        vy_new = beta * b_ym * air + (b_ym - beta) * wall

        # -- outer-edge impedance ABC as index masks  (FDTD.cpp:201-223)
        if absorbing:
            top = jnp.where(gj < gy, -p, 0.0)
            bot = jnp.where(gj < gy, p_xm, 0.0)
            left = jnp.where(gi < gx, -p, 0.0)
            right = jnp.where(gi < gx, p_ym, 0.0)
        else:
            top = bot = jnp.zeros((npx, npy), jnp.float32)
            left = right = jnp.zeros((npx, npy), jnp.float32)
        vx = jnp.where(gi == 0, top, jnp.where(gi == gx, bot, vx_new))
        vy = jnp.where(gj == 0, left, jnp.where(gj == gy, right, vy_new))

        # -- streaming onset + flux, masked off in the T padding tail
        tf = t.astype(jnp.float32)
        live = tf < float(t_real)
        onset = jnp.minimum(
            onset, jnp.where(live & (jnp.abs(p) > thr), tf, jnp.inf))
        m = ((tf < onset + src_dir_n) & live).astype(jnp.float32)
        fx = fx + m * p * vx
        fy = fy + m * p * vy

        # -- record (pre-injection), then inject at the listener cell
        rec_ref[k] = p
        p = p + src * pulse_ref[t, 0]
        return p, vx, vy, onset, fx, fy

    carry = (p_ref[:], vx_ref[:], vy_ref[:],
             onset_ref[:], fx_ref[:], fy_ref[:])
    p, vx, vy, onset, fx, fy = jax.lax.fori_loop(0, chunk, one_step, carry)
    p_ref[:] = p
    vx_ref[:] = vx
    vy_ref[:] = vy
    onset_ref[:] = onset
    fx_ref[:] = fx
    fy_ref[:] = fy


@functools.partial(jax.jit, static_argnames=("params", "interpret", "chunk"))
def simulate_pallas(params: GridParams, beta, refl, pulse,
                    listener_ix, listener_iy,
                    interpret: bool = False, chunk: int = 16) -> FdtdResult:
    """Run one full simulation pass in a single fused kernel.

    Args/returns match ops/fdtd.py::simulate, except the returned grids are
    tile-padded to [npx, npy] >= [nx, ny] and [T] to the chunk multiple; the
    analyzer only reads the [:T, :grid_x, :grid_y] corner, so no crop is
    needed. ``chunk`` timesteps run per grid iteration so the recording is
    flushed to HBM in chunk-sized slabs (amortizing per-iteration DMA cost);
    simulation results are chunk-invariant.
    """
    nx, ny = params.nx, params.ny
    npx = pad_tile(nx, _SUBLANE)
    npy = pad_tile(ny, _LANE)
    T = params.response_length
    T_pad = pad_tile(T, chunk)

    beta_p = jnp.zeros((npx, npy), jnp.float32).at[:nx, :ny].set(beta)
    refl_p = jnp.zeros((npx, npy), jnp.float32).at[:nx, :ny].set(refl)
    Y = admittance(refl_p)

    # static backward-shifted geometry (value at i-1 / j-1, zero row/col 0)
    zrow = jnp.zeros((1, npy), jnp.float32)
    zcol = jnp.zeros((npx, 1), jnp.float32)
    b_xm = jnp.concatenate([zrow, beta_p[:-1]], axis=0)
    y_xm = jnp.concatenate([zrow, Y[:-1]], axis=0)
    b_ym = jnp.concatenate([zcol, beta_p[:, :-1]], axis=1)
    y_ym = jnp.concatenate([zcol, Y[:, :-1]], axis=1)

    scal = jnp.array([listener_ix, listener_iy],
                     dtype=jnp.int32).reshape(1, 2)
    pulse2 = jnp.zeros((T_pad, 1), jnp.float32).at[:T, 0].set(
        pulse.astype(jnp.float32))

    kernel = functools.partial(
        _kernel,
        courant=float(params.courant),
        thr=float(params.constants.audible_threshold_gain),
        src_dir_n=float(params.source_dir_samples),
        gx=params.grid_x, gy=params.grid_y,
        absorbing=params.boundary_type == BoundaryType.ABSORBING,
        npx=npx, npy=npy, chunk=chunk, t_real=T)

    field = pl.BlockSpec((npx, npy), lambda c: (0, 0),
                         memory_space=pltpu.VMEM)

    rec, onset, fx, fy = pl.pallas_call(
        kernel,
        grid=(T_pad // chunk,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda c: (0, 0), memory_space=pltpu.SMEM),
            field, field, field, field, field, field,
            pl.BlockSpec((T_pad, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, npx, npy), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            field, field, field,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, npx, npy), jnp.float32),
            jax.ShapeDtypeStruct((npx, npy), jnp.float32),
            jax.ShapeDtypeStruct((npx, npy), jnp.float32),
            jax.ShapeDtypeStruct((npx, npy), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((npx, npy), jnp.float32),
            pltpu.VMEM((npx, npy), jnp.float32),
            pltpu.VMEM((npx, npy), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=T * npx * npy * 30,
            bytes_accessed=T * npx * npy * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, beta_p, Y, b_xm, y_xm, b_ym, y_ym, pulse2)

    # crop the T padding (rows past T hold harmless continued simulation,
    # but the analyzer's windows assume exactly response_length rows)
    return FdtdResult(pressure=rec[:T], onset=onset, flux_x=fx, flux_y=fy)


def simulate_auto(params: GridParams, beta, refl, pulse,
                  listener_ix, listener_iy) -> FdtdResult:
    """Pallas kernel on TPU, lax.scan elsewhere (CPU tests, oracle parity)."""
    if jax.devices()[0].platform == "tpu":
        return simulate_pallas(params, beta, refl, pulse,
                               listener_ix, listener_iy)
    return fdtd_scan.simulate(params, beta, refl, pulse,
                              listener_ix, listener_iy)
