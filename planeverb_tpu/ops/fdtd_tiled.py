"""Tiled Pallas FDTD for grids beyond VMEM — HBM state, k-step band streaming.

The fused kernel (ops/fdtd_pallas.py) keeps the whole wave state in VMEM and
tops out around ~600k cells. This kernel removes that ceiling: p/vx/vy live
in HBM, and each grid step DMAs one full-width *row band* plus a k-row halo
into VMEM, advances it k timesteps locally (the stencil radius is 1
cell/step, so a k-wide ghost stays exact for k steps — same argument as
parallel/solver.py::simulate_sharded_wide), and writes the band interior
back. Bands span the whole y extent, so lane-dimension DMA slices are always
full width (Mosaic requires 128-alignment there) and no y halo exists — the
in-window shifts handle the global y edges exactly like the fused kernel.

Amortized HBM traffic per cell per step:

    (3 state + 2 geometry reads + 3 state writes) * 4 B / k  +  4 B record
    ~= 32/k + 4 B  ->  ~6 B/cell/step at k = 16 (record-dominated)

Design notes:
  - Within a time round every band must read round-start state while earlier
    bands already wrote theirs: state is double-buffered [2, ...] with the
    round parity selecting read/write slots.
  - State and accumulators are *output* buffers that the kernel both reads
    and writes across sequential grid iterations (no input/output aliasing,
    which interpret mode does not honor). Round 0 initializes the VMEM
    windows directly instead of loading.
  - State arrays carry a k-row border in x so edge-band windows stay in
    bounds; the border is never written, so loads pin it to exact zeros.
  - Capacity: rows are unbounded; width is bounded by the VMEM band budget
    (~8k columns at k=16) — beyond that, shard over chips (parallel/).

Semantics match ops/fdtd.py bit-for-bit (golden tests, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planeverb_tpu.config import BoundaryType, GridParams
from planeverb_tpu.ops.fdtd import (FdtdResult, admittance,
                                    stencil_coefficients)
from planeverb_tpu.ops.fdtd_pallas import (pad_tile, _LANE, _SUBLANE,
                                           _steps_per_body,
                                           check_recording_elements)

__all__ = ["simulate_tiled", "simulate_moments_tiled"]


def _tiled_kernel(scal_ref, pulse_ref, beta_hbm, y_hbm,
                  p_st, vx_st, vy_st,
                  onset_o, fx_o, fy_o, ed_o, ew_o, et_o,
                  rec_hbm,
                  *, courant, thr, src_dir_n, gx, gy, absorbing,
                  bx, k, t_real, dry_n, wet_n, npx, npy):
    c = pl.program_id(0)
    tx = pl.program_id(1)
    hbx = bx + 2 * k

    def body(pw, vxw, vyw, bw, yw, onset_t, fx_t, fy_t, ed_t, ew_t, et_t,
             rec_t, sems):
        row = tx * bx            # window start in the x-bordered state array
        read_slot = jax.lax.rem(c, 2)
        write_slot = jax.lax.rem(c + 1, 2)

        gi = (tx * bx - k
              + jax.lax.broadcasted_iota(jnp.int32, (hbx, npy), 0))
        gj = jax.lax.broadcasted_iota(jnp.int32, (hbx, npy), 1)
        frame = (gi < 0) | (gi >= npx)   # x border, never written

        geo = [
            pltpu.make_async_copy(
                beta_hbm.at[pl.ds(row, hbx)], bw, sems.at[0]),
            pltpu.make_async_copy(
                y_hbm.at[pl.ds(row, hbx)], yw, sems.at[1]),
        ]
        for dma in geo:
            dma.start()

        @pl.when(c == 0)
        def _init():
            zeros = jnp.zeros((hbx, npy), jnp.float32)
            pw[:] = zeros
            vxw[:] = zeros
            vyw[:] = zeros
            onset_t[:] = jnp.full((bx, npy), jnp.inf, jnp.float32)
            ztile = jnp.zeros((bx, npy), jnp.float32)
            fx_t[:] = ztile
            fy_t[:] = ztile
            ed_t[:] = ztile
            ew_t[:] = ztile
            et_t[:] = ztile

        @pl.when(c != 0)
        def _load():
            loads = [
                pltpu.make_async_copy(
                    p_st.at[read_slot, pl.ds(row, hbx)], pw, sems.at[2]),
                pltpu.make_async_copy(
                    vx_st.at[read_slot, pl.ds(row, hbx)], vxw, sems.at[3]),
                pltpu.make_async_copy(
                    vy_st.at[read_slot, pl.ds(row, hbx)], vyw, sems.at[4]),
                pltpu.make_async_copy(
                    onset_o.at[pl.ds(tx * bx, bx)], onset_t, sems.at[5]),
                pltpu.make_async_copy(
                    fx_o.at[pl.ds(tx * bx, bx)], fx_t, sems.at[6]),
                pltpu.make_async_copy(
                    fy_o.at[pl.ds(tx * bx, bx)], fy_t, sems.at[7]),
                pltpu.make_async_copy(
                    ed_o.at[pl.ds(tx * bx, bx)], ed_t, sems.at[8]),
                pltpu.make_async_copy(
                    ew_o.at[pl.ds(tx * bx, bx)], ew_t, sems.at[9]),
                pltpu.make_async_copy(
                    et_o.at[pl.ds(tx * bx, bx)], et_t, sems.at[10]),
            ]
            for dma in loads:
                dma.start()
            for dma in loads:
                dma.wait()
            # the x-border is never written: pin it to exact zeros
            pw[:] = jnp.where(frame, 0.0, pw[:])
            vxw[:] = jnp.where(frame, 0.0, vxw[:])
            vyw[:] = jnp.where(frame, 0.0, vyw[:])

        for dma in geo:
            dma.wait()

        # ---- local k-step advance (identical math to the fused kernel):
        # walls + edge ABC folded into static coefficients. Window-edge
        # shift artifacts only ever contaminate the outermost halo row per
        # step, which the k-step halo argument already discards.
        beta = bw[:]
        Y = yw[:]
        zrow = jnp.zeros((1, npy), jnp.float32)
        zcol = jnp.zeros((hbx, 1), jnp.float32)
        b_xm = jnp.concatenate([zrow, beta[:-1]], axis=0)
        y_xm = jnp.concatenate([zrow, Y[:-1]], axis=0)
        b_ym = jnp.concatenate([zcol, beta[:, :-1]], axis=1)
        y_ym = jnp.concatenate([zcol, Y[:, :-1]], axis=1)
        a_x, b_x, d_x, a_y, b_y, d_y = stencil_coefficients(
            beta, Y, b_xm, y_xm, b_ym, y_ym, gi, gj, gx, gy, absorbing)

        lix = scal_ref[0, 0]
        liy = scal_ref[0, 1]
        src = ((gi == lix) & (gj == liy)).astype(jnp.float32)
        interior = slice(k, k + bx)

        def one_step(s, st):
            p, vx, vy, onset, fx, fy, ed, ew, et = st
            t = c * k + s

            vx_xp = jnp.concatenate([vx[1:], zrow], axis=0)
            vy_yp = jnp.concatenate([vy[:, 1:], zcol], axis=1)
            div = (vx_xp - vx) + (vy_yp - vy)
            p = beta * (p - courant * div)

            p_xm = jnp.concatenate([zrow, p[:-1]], axis=0)
            air = vx - courant * (p - p_xm)
            vx = a_x * air + b_x * p + d_x * p_xm

            p_ym = jnp.concatenate([zcol, p[:, :-1]], axis=1)
            air = vy - courant * (p - p_ym)
            vy = a_y * air + b_y * p + d_y * p_ym

            # streaming moments on the band interior; scalar-side window
            # bounds exactly as in fdtd_pallas._kernel
            tf = t.astype(jnp.float32)
            live = tf < float(t_real)
            t_on = jnp.where(live, tf, jnp.inf)
            c_flux = jnp.where(live, tf - src_dir_n, jnp.inf)
            c_dry = jnp.where(live, tf - float(dry_n), jnp.inf)
            c_wet_lo = jnp.where(live, tf - float(dry_n) - 1.0, -jnp.inf)
            c_wet_hi = tf - float(dry_n) - 1.0 - float(wet_n)

            p_int = p[interior]
            onset = jnp.minimum(
                onset, jnp.where(jnp.abs(p_int) > thr, t_on, jnp.inf))
            mp = jnp.where(onset > c_flux, p_int, 0.0)
            fx = fx + mp * vx[interior]
            fy = fy + mp * vy[interior]
            sq = p_int * p_int
            ed = jnp.where(onset > c_dry, ed + sq, ed)
            ew = jnp.where((onset <= c_wet_lo) & (onset > c_wet_hi),
                           ew + sq, ew)
            et = jnp.where(live, et + sq, et)

            rec_t[s] = p_int
            p = p + src * pulse_ref[t, 0]
            return p, vx, vy, onset, fx, fy, ed, ew, et

        state = (pw[:], vxw[:], vyw[:], onset_t[:], fx_t[:], fy_t[:],
                 ed_t[:], ew_t[:], et_t[:])
        # register-reuse unroll (ops/fdtd_pallas.py::_steps_per_body)
        spb = _steps_per_body(k)

        def multi_step(j, carry):
            for u in range(spb):
                carry = one_step(j * spb + u, carry)
            return carry

        p, vx, vy, onset, fx, fy, ed, ew, et = jax.lax.fori_loop(
            0, k // spb, multi_step, state)

        # ---- stage results and DMA out (interior rows only for state)
        pw[:] = p
        vxw[:] = vx
        vyw[:] = vy
        onset_t[:] = onset
        fx_t[:] = fx
        fy_t[:] = fy
        ed_t[:] = ed
        ew_t[:] = ew
        et_t[:] = et
        irow = row + k
        writes = [
            pltpu.make_async_copy(
                pw.at[interior], p_st.at[write_slot, pl.ds(irow, bx)],
                sems.at[0]),
            pltpu.make_async_copy(
                vxw.at[interior], vx_st.at[write_slot, pl.ds(irow, bx)],
                sems.at[1]),
            pltpu.make_async_copy(
                vyw.at[interior], vy_st.at[write_slot, pl.ds(irow, bx)],
                sems.at[2]),
            pltpu.make_async_copy(
                onset_t, onset_o.at[pl.ds(tx * bx, bx)], sems.at[3]),
            pltpu.make_async_copy(
                fx_t, fx_o.at[pl.ds(tx * bx, bx)], sems.at[4]),
            pltpu.make_async_copy(
                fy_t, fy_o.at[pl.ds(tx * bx, bx)], sems.at[5]),
            pltpu.make_async_copy(
                ed_t, ed_o.at[pl.ds(tx * bx, bx)], sems.at[6]),
            pltpu.make_async_copy(
                ew_t, ew_o.at[pl.ds(tx * bx, bx)], sems.at[7]),
            pltpu.make_async_copy(
                et_t, et_o.at[pl.ds(tx * bx, bx)], sems.at[8]),
            pltpu.make_async_copy(
                rec_t, rec_hbm.at[pl.ds(c * k, k), pl.ds(tx * bx, bx)],
                sems.at[9]),
        ]
        for dma in writes:
            dma.start()
        for dma in writes:
            dma.wait()

    pl.run_scoped(
        body,
        pw=pltpu.VMEM((hbx, npy), jnp.float32),
        vxw=pltpu.VMEM((hbx, npy), jnp.float32),
        vyw=pltpu.VMEM((hbx, npy), jnp.float32),
        bw=pltpu.VMEM((hbx, npy), jnp.float32),
        yw=pltpu.VMEM((hbx, npy), jnp.float32),
        onset_t=pltpu.VMEM((bx, npy), jnp.float32),
        fx_t=pltpu.VMEM((bx, npy), jnp.float32),
        fy_t=pltpu.VMEM((bx, npy), jnp.float32),
        ed_t=pltpu.VMEM((bx, npy), jnp.float32),
        ew_t=pltpu.VMEM((bx, npy), jnp.float32),
        et_t=pltpu.VMEM((bx, npy), jnp.float32),
        rec_t=pltpu.VMEM((k, bx, npy), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((11,)),
    )


def _pick_band(nx: int, npy: int, k: int, band_rows: int | None) -> int:
    """Band height: requested (tile-aligned) or sized to the VMEM budget.

    Beyond the explicit scratch (5 window + 6 tile + k record rows), Mosaic
    stacks the fori_loop carries and body temporaries (~20 more window-sized
    arrays). r4 sweep on the 459^2 workload (npy=512, k=16): ~40-row bands
    (the old 6 MB budget) -> 18.1 G, 64 -> 18.6 G, 96 -> 20.3 G
    cell-updates/s — taller bands amortize the k halo rows' redundant
    compute, and the 5-plane kernel compiles in seconds at any height —
    so the budget targets ~96 rows on 512-wide grids, capped at the
    largest hardware-validated height.
    """
    if band_rows is not None:
        return max(_SUBLANE, pad_tile(band_rows, _SUBLANE))
    budget = 12 << 20
    per_row = (24 + k) * npy * 4
    bx = max(_SUBLANE, (budget // per_row) - 2 * k)
    bx = max(_SUBLANE, (bx // _SUBLANE) * _SUBLANE)
    bx = min(bx, 96)
    return min(bx, pad_tile(nx, _SUBLANE))


def _simulate_tiled_impl(params: GridParams, beta, refl, pulse,
                         listener_ix, listener_iy,
                         band_rows: int | None = None, halo: int = 16,
                         interpret: bool = False):
    """Core tiled pass. Returns (rec_padded [T_pad, npx, npy], onset, fx,
    fy, ed, ew, et) — the UNcropped whole-slab recording, so the moments
    pass can consume it without a multi-GB re-pad copy (a second
    recording-sized buffer exhausts HBM on XL grids)."""
    nx, ny = params.nx, params.ny
    npy = pad_tile(ny, _LANE)
    k = halo
    bx = _pick_band(nx, npy, k, band_rows)
    npx = -(-nx // bx) * bx
    ntx = npx // bx
    T = params.response_length
    rounds = -(-T // k)
    T_pad = rounds * k
    check_recording_elements(T_pad, npx, npy, "tiled solver")

    beta_p = jnp.zeros((npx + 2 * k, npy),
                       jnp.float32).at[k:k + nx, :ny].set(beta)
    refl_p = jnp.zeros((npx + 2 * k, npy),
                       jnp.float32).at[k:k + nx, :ny].set(refl)
    # Y = admittance(0) = 1 in the border/padding is harmless: every term it
    # feeds is gated by beta masks that are 0 there, and the one place it
    # differs from the single-chip zero padding (w_x at global row 0) only
    # affects rows the edge ABC overwrites.
    Y = admittance(refl_p)

    scal = jnp.array([listener_ix, listener_iy],
                     dtype=jnp.int32).reshape(1, 2)
    pulse2 = jnp.zeros((T_pad, 1), jnp.float32).at[:T, 0].set(
        pulse.astype(jnp.float32))

    kernel = functools.partial(
        _tiled_kernel,
        courant=float(params.courant),
        thr=float(params.constants.audible_threshold_gain),
        src_dir_n=float(params.source_dir_samples),
        gx=params.grid_x, gy=params.grid_y,
        absorbing=params.boundary_type == BoundaryType.ABSORBING,
        bx=bx, k=k, t_real=T,
        dry_n=params.dry_gain_samples, wet_n=params.wet_gain_samples,
        npx=npx, npy=npy)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    cell_shape = jax.ShapeDtypeStruct((npx, npy), jnp.float32)
    state_shape = jax.ShapeDtypeStruct((2, npx + 2 * k, npy), jnp.float32)

    outs = pl.pallas_call(
        kernel,
        grid=(rounds, ntx),
        in_specs=[
            pl.BlockSpec((1, 2), lambda c, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T_pad, 1), lambda c, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            any_spec, any_spec,
        ],
        out_specs=[any_spec] * 10,
        out_shape=[state_shape, state_shape, state_shape,
                   cell_shape, cell_shape, cell_shape,
                   cell_shape, cell_shape, cell_shape,
                   jax.ShapeDtypeStruct((T_pad, npx, npy), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(scal, pulse2, beta_p, Y)

    (_, _, _, onset, fx, fy, ed, ew, et, rec) = outs
    return rec, onset, fx, fy, ed, ew, et


@functools.partial(jax.jit,
                   static_argnames=("params", "band_rows", "halo",
                                    "interpret"))
def simulate_tiled(params: GridParams, beta, refl, pulse,
                   listener_ix, listener_iy,
                   band_rows: int | None = None, halo: int = 16,
                   interpret: bool = False):
    """One simulation pass with HBM-resident state and k-step band streaming.

    Returns (FdtdResult, (e_dry, e_wet, e_total)) with grids padded to band
    multiples; crop to params dims for analysis.
    """
    rec, onset, fx, fy, ed, ew, et = _simulate_tiled_impl(
        params, beta, refl, pulse, listener_ix, listener_iy,
        band_rows=band_rows, halo=halo, interpret=interpret)
    res = FdtdResult(pressure=rec[:params.response_length], onset=onset,
                     flux_x=fx, flux_y=fy)
    return res, (ed, ew, et)


def _tiled_moments_kernel(onset_hbm, rec_hbm,
                          s0_o, s1_o, edc_o,
                          *, bx, k, t_real, dry_n, schro_off, n_rounds):
    """Backward band-streamed RT60 moments (fdtd_pallas._moments_kernel for
    grids beyond VMEM). Grid = (rounds, ntx) with time iterated in reverse;
    per-band suffix-EDC/s0/s1 are read-modified-written through the output
    refs (sequential rounds, disjoint bands)."""
    c = pl.program_id(0)
    tx = pl.program_id(1)

    def body(onset_t, rec_t, edc_t, s0_t, s1_t, sems):
        row = tx * bx
        tc = n_rounds - 1 - c        # time chunk, newest first

        loads = [
            pltpu.make_async_copy(
                onset_hbm.at[pl.ds(row, bx)], onset_t, sems.at[0]),
            pltpu.make_async_copy(
                rec_hbm.at[pl.ds(tc * k, k), pl.ds(row, bx)], rec_t,
                sems.at[1]),
        ]
        for dma in loads:
            dma.start()

        @pl.when(c == 0)
        def _init():
            zeros = jnp.zeros_like(edc_t)
            edc_t[:] = zeros
            s0_t[:] = zeros
            s1_t[:] = zeros

        @pl.when(c != 0)
        def _load_acc():
            accs = [
                pltpu.make_async_copy(
                    edc_o.at[pl.ds(row, bx)], edc_t, sems.at[2]),
                pltpu.make_async_copy(
                    s0_o.at[pl.ds(row, bx)], s0_t, sems.at[3]),
                pltpu.make_async_copy(
                    s1_o.at[pl.ds(row, bx)], s1_t, sems.at[4]),
            ]
            for dma in accs:
                dma.start()
            for dma in accs:
                dma.wait()

        for dma in loads:
            dma.wait()

        onset = onset_t[:]
        start = onset + float(dry_n + 1)
        end = float(t_real - schro_off)
        log10_scale = float(10.0 / np.log(10.0))

        def step(s, carry):
            edc, s0, s1 = carry
            kk = k - 1 - s                       # reverse within the chunk
            t = tc * k + kk
            tf = t.astype(jnp.float32)
            p = rec_t[kk]
            live = (tf < float(t_real)).astype(jnp.float32)
            edc = edc + p * p * live
            y = jnp.log(jnp.maximum(edc, 1e-37)) * log10_scale
            m = ((tf >= start) & (tf < end)).astype(jnp.float32)
            s0 = s0 + m * y
            s1 = s1 + m * (tf - start) * y
            return edc, s0, s1

        # register-reuse unroll (ops/fdtd_pallas.py::_steps_per_body)
        spb_m = _steps_per_body(k)

        def multi(j, carry):
            for u in range(spb_m):
                carry = step(j * spb_m + u, carry)
            return carry

        edc, s0, s1 = jax.lax.fori_loop(
            0, k // spb_m, multi, (edc_t[:], s0_t[:], s1_t[:]))
        edc_t[:] = edc
        s0_t[:] = s0
        s1_t[:] = s1
        writes = [
            pltpu.make_async_copy(
                edc_t, edc_o.at[pl.ds(row, bx)], sems.at[2]),
            pltpu.make_async_copy(
                s0_t, s0_o.at[pl.ds(row, bx)], sems.at[3]),
            pltpu.make_async_copy(
                s1_t, s1_o.at[pl.ds(row, bx)], sems.at[4]),
        ]
        for dma in writes:
            dma.start()
        for dma in writes:
            dma.wait()

    npy = onset_hbm.shape[1]
    pl.run_scoped(
        body,
        onset_t=pltpu.VMEM((bx, npy), jnp.float32),
        rec_t=pltpu.VMEM((k, bx, npy), jnp.float32),
        edc_t=pltpu.VMEM((bx, npy), jnp.float32),
        s0_t=pltpu.VMEM((bx, npy), jnp.float32),
        s1_t=pltpu.VMEM((bx, npy), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((5,)),
    )


def _tiled_rt60_moments(params: GridParams, onset, rec_pad,
                        band_rows: int | None, halo: int,
                        interpret: bool):
    """Backward band-streamed RT60 regression pass over an uncropped
    [T_pad, npx, npy] recording: returns (s0, s1). Shared by
    :func:`simulate_moments_tiled` and the sharded solver's exchange-free
    1x1-mesh delegation (parallel/solver_pallas.py)."""
    npx, npy = onset.shape
    k = halo
    bx = _pick_band(params.nx, npy, k, band_rows)
    bx = min(bx, npx)
    ntx = npx // bx
    T = params.response_length
    n_rounds = -(-T // k)

    kernel = functools.partial(
        _tiled_moments_kernel,
        bx=bx, k=k, t_real=T, dry_n=params.dry_gain_samples,
        schro_off=params.schroeder_offset_samples, n_rounds=n_rounds)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    cell_shape = jax.ShapeDtypeStruct((npx, npy), jnp.float32)
    s0, s1, _edc = pl.pallas_call(
        kernel,
        grid=(n_rounds, ntx),
        in_specs=[any_spec, any_spec],
        out_specs=[any_spec] * 3,
        out_shape=[cell_shape, cell_shape, cell_shape],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(onset, rec_pad)
    return s0, s1


@functools.partial(jax.jit,
                   static_argnames=("params", "band_rows", "halo",
                                    "interpret", "return_pressure",
                                    "full_pressure"))
def simulate_moments_tiled(params: GridParams, beta, refl, pulse,
                           listener_ix, listener_iy,
                           band_rows: int | None = None,
                           halo: int = 16, interpret: bool = False,
                           return_pressure: bool = True,
                           full_pressure: bool = False):
    """Tiled sim + full analyzer moments (large-grid analog of
    fdtd_pallas.simulate_moments_pallas). Returns (FdtdResult, Moments).

    ``return_pressure=False`` returns an EMPTY pressure array instead of
    the [T, npx, npy] recording: moments-only callers (benchmarks, engines
    in cells-publish mode) then don't force a second recording-sized
    output buffer into HBM — on XL grids (~8 GB recordings) keeping both
    the internal slab buffer and the sliced output alive exhausts the
    chip. ``full_pressure=True`` returns the recording UNcropped
    ([T_pad, npx, npy], the slab buffer itself — no copy at all); crop at
    query time (fdtd_pallas.simulate_moments_pallas's note — the [:T]
    crop is a recording-sized device copy, GBs here)."""
    from planeverb_tpu.ops.analyzer import Moments

    rec_pad, onset, fx, fy, ed, ew, et = _simulate_tiled_impl(
        params, beta, refl, pulse, listener_ix, listener_iy,
        band_rows=band_rows, halo=halo, interpret=interpret)
    if not return_pressure:
        pressure = rec_pad[:0]
    elif full_pressure:
        pressure = rec_pad
    else:
        pressure = rec_pad[:params.response_length]
    res = FdtdResult(pressure=pressure, onset=onset,
                     flux_x=fx, flux_y=fy)
    s0, s1 = _tiled_rt60_moments(params, res.onset, rec_pad,
                                 band_rows, halo, interpret)
    return res, Moments(e_dry=ed, e_wet=ew, e_total=et, s0=s0, s1=s1)
