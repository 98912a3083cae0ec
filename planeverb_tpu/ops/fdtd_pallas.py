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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planeverb_tpu.config import BoundaryType, GridParams
from planeverb_tpu.ops.fdtd import FdtdResult, admittance
from planeverb_tpu.ops import fdtd as fdtd_scan

__all__ = ["simulate_pallas", "simulate_moments_pallas", "simulate_auto",
           "pipeline_auto", "pad_tile", "simulate_moments_pallas_batch",
           "pipeline_auto_batch", "batch_recording_elements"]

_SUBLANE = 8
_LANE = 128


def pad_tile(n: int, m: int) -> int:
    return -(-n // m) * m


# One XLA/Mosaic buffer is limited to 2^31 - 1 ELEMENTS (int32 linear
# indexing): a [T_pad, npx, npy] recording at exactly 2^31 elements crashes
# the TPU compiler (verified on v5e: 2048x1024x1024 f32 fails, 2032-step
# pads succeed). The guard turns that crash into actionable guidance.
MAX_BUFFER_ELEMENTS = (1 << 31) - 1


def check_recording_elements(t_pad: int, rows: int, cols: int,
                             where: str) -> None:
    """Raise a clear error when a recording buffer would exceed the 2^31-1
    element limit of a single TPU buffer (~2.1e9 cell-steps — e.g. a
    133 m @ 750 Hz world at its full diagonal-covering IR length)."""
    n = t_pad * rows * cols
    if n > MAX_BUFFER_ELEMENTS:
        raise ValueError(
            f"{where}: the [T={t_pad}, {rows}, {cols}] impulse-response "
            f"recording has {n} elements, over the 2^31-1 single-buffer "
            f"limit of one TPU chip. Shard the grid over a device mesh "
            f"(Context(mesh=...) — per-shard recordings divide by the chip "
            f"count), lower the resolution, or shrink the grid/IR length.")


def batch_recording_elements(params: GridParams, B: int,
                             chunk: int = 16) -> int:
    """Elements of the batched fused kernel's ONE shared
    [B*T_pad, npx, npy] recording buffer (:func:`_simulate_impl_batch`).

    The 2^31-1 single-buffer guard and the multi-listener batch/fallback
    routing (core/context.py::_pipeline_packed_multi) both derive from
    this definition, so a change to the batched kernel's padding or chunk
    cannot drift them apart (ADVICE r4)."""
    return (B * pad_tile(params.response_length, chunk)
            * pad_tile(params.nx, _SUBLANE) * pad_tile(params.ny, _LANE))


def _steps_per_body(chunk: int, want: int = 4) -> int:
    """Timestep-loop unroll factor: largest divisor of ``chunk`` <= want.

    Unrolling several steps per fori body keeps the carry arrays in vector
    registers across the group instead of spilling to VMEM at every body
    boundary (see the note in :func:`_kernel`); results are bit-identical
    (same ops, same order — pinned by the interpret-mode parity tests and
    verified bit-equal on v5e)."""
    spb = min(want, chunk)
    while chunk % spb != 0:
        spb -= 1
    return spb


def _kernel(scal_ref, beta_ref, ax_ref, bx_ref, dx_ref,
            ay_ref, by_ref, dy_ref,
            pulse_ref, rec_ref, onset_ref, fx_ref, fy_ref,
            ed_ref, ew_ref, et_ref,
            p_ref, vx_ref, vy_ref,
            *, courant, thr, src_dir_n, npx, npy,
            chunk, t_real, dry_n, wet_n, state_dtype=jnp.float32,
            batched=False):
    """``state_dtype=jnp.bfloat16`` is the opt-in half-precision wave-state
    mode: p/vx/vy, the stencil coefficients, and the recording all carry
    bf16 (half the vregs per array, half the recording HBM traffic), while
    every accumulator that sums across timesteps (onset, flux, windowed
    energies) stays f32 — 1187-term bf16 sums would lose ~3 digits. Gated
    by parameter-level golden tolerances, not bit parity
    (tests/test_fdtd_pallas.py::test_bf16_*).

    ``batched=True`` runs under a (B, n_chunks) grid — the multi-listener
    data-parallel mode (_simulate_impl_batch): program_id(0) is the
    listener, the chunk index moves to program_id(1), and the BlockSpecs
    route per-listener scal/recording/accumulator blocks while beta and the
    six stencil coefficients keep constant index maps (loaded into VMEM
    once, shared by all B listeners — they are listener-invariant). The
    kernel body itself is identical per listener, so batched results are
    bit-identical to B single-listener passes."""
    c = pl.program_id(1) if batched else pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        szeros = jnp.zeros((npx, npy), state_dtype)
        zeros = jnp.zeros((npx, npy), jnp.float32)
        p_ref[:] = szeros
        vx_ref[:] = szeros
        vy_ref[:] = szeros
        onset_ref[:] = jnp.full((npx, npy), jnp.inf, jnp.float32)
        fx_ref[:] = zeros
        fy_ref[:] = zeros
        ed_ref[:] = zeros
        ew_ref[:] = zeros
        et_ref[:] = zeros

    beta = beta_ref[:]
    # static per-geometry stencil coefficients folding walls + edge ABC
    # (ops/fdtd.py::stencil_coefficients): v' = A*air + B*p + D*p_m
    a_x = ax_ref[:]
    b_x = bx_ref[:]
    d_x = dx_ref[:]
    a_y = ay_ref[:]
    b_y = by_ref[:]
    d_y = dy_ref[:]
    gi = jax.lax.broadcasted_iota(jnp.int32, (npx, npy), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (npx, npy), 1)
    # batched mode passes the whole [B, 2] listener table in SMEM (blocks
    # must span SMEM arrays) and indexes it by the listener grid axis
    row = pl.program_id(0) if batched else 0
    lix = scal_ref[row, 0]
    liy = scal_ref[row, 1]
    src = ((gi == lix) & (gj == liy)).astype(state_dtype)
    zrow = jnp.zeros((1, npy), state_dtype)
    zcol = jnp.zeros((npx, 1), state_dtype)

    def one_step(k, carry):
        p, vx, vy, onset, fx, fy, ed, ew, et = carry
        t = c * chunk + k

        # -- pressure: p = beta * (p - C * div v)     (FDTD.cpp:124-141)
        vx_xp = jnp.concatenate([vx[1:], zrow], axis=0)
        vy_yp = jnp.concatenate([vy[:, 1:], zcol], axis=1)
        div = (vx_xp - vx) + (vy_yp - vy)
        p = beta * (p - courant * div)

        # -- velocities: walls + edge ABC prefolded   (FDTD.cpp:143-223)
        p_xm = jnp.concatenate([zrow, p[:-1]], axis=0)
        air = vx - courant * (p - p_xm)
        vx = a_x * air + b_x * p + d_x * p_xm

        p_ym = jnp.concatenate([zcol, p[:, :-1]], axis=1)
        air = vy - courant * (p - p_ym)
        vy = a_y * air + b_y * p + d_y * p_ym

        # -- streaming onset / flux / windowed energies. The per-step window
        # predicates compare the *running* onset against scalar-side bounds
        # (tf and the window widths are small-integer-valued f32, so the
        # rearranged comparisons are exact; see ops/analyzer.py::Moments).
        # live (= not in the T padding tail) folds into the scalar bound.
        tf = t.astype(jnp.float32)
        live = tf < float(t_real)
        t_on = jnp.where(live, tf, jnp.inf)              # scalar
        c_flux = jnp.where(live, tf - src_dir_n, jnp.inf)
        c_dry = jnp.where(live, tf - float(dry_n), jnp.inf)
        c_wet_lo = jnp.where(live, tf - float(dry_n) - 1.0, -jnp.inf)
        c_wet_hi = tf - float(dry_n) - 1.0 - float(wet_n)

        # accumulators stay f32 even in bf16 state mode (sums over ~1e3
        # steps; see the state_dtype note in the docstring). The threshold
        # compare also runs on the f32 copy: a mask born in the packed-bf16
        # layout feeding f32 selects trips a Mosaic i1-relayout error
        # ("non-singleton logical dimension is replicated").
        p32 = p.astype(jnp.float32)
        onset = jnp.minimum(onset,
                            jnp.where(jnp.abs(p32) > thr, t_on, jnp.inf))
        mp = jnp.where(onset > c_flux, p32, 0.0)
        fx = fx + mp * vx.astype(jnp.float32)
        fy = fy + mp * vy.astype(jnp.float32)
        sq = p32 * p32
        ed = jnp.where(onset > c_dry, ed + sq, ed)
        ew = jnp.where((onset <= c_wet_lo) & (onset > c_wet_hi), ew + sq, ew)
        et = jnp.where(live, et + sq, et)

        # -- record (pre-injection), then inject at the listener cell
        rec_ref[k] = p
        p = p + src * pulse_ref[t, 0].astype(state_dtype)
        return p, vx, vy, onset, fx, fy, ed, ew, et

    carry = (p_ref[:], vx_ref[:], vy_ref[:],
             onset_ref[:], fx_ref[:], fy_ref[:],
             ed_ref[:], ew_ref[:], et_ref[:])
    # several timesteps per fori body: the 9 carry arrays far exceed the
    # vector register file, so every loop-body boundary spills/reloads all
    # of them through VMEM; unrolling steps inside one body lets Mosaic
    # keep p/vx/vy and the accumulators in registers across the group.
    # Measured r4 (192x192@750, controlled ablation, bit-identical): 1
    # step/body 31.4 G, 2/body 46.7 G, 4/body 54.6 G cell-updates/s.
    spb = _steps_per_body(chunk)

    def multi_step(j, carry):
        for u in range(spb):
            carry = one_step(j * spb + u, carry)
        return carry

    (p, vx, vy, onset, fx, fy, ed, ew, et) = jax.lax.fori_loop(
        0, chunk // spb, multi_step, carry)
    p_ref[:] = p
    vx_ref[:] = vx
    vy_ref[:] = vy
    onset_ref[:] = onset
    fx_ref[:] = fx
    fy_ref[:] = fy
    ed_ref[:] = ed
    ew_ref[:] = ew
    et_ref[:] = et


def _moments_kernel(onset_ref, pres_ref, s0_ref, s1_ref,
                    edc_ref,
                    *, chunk, t_real, dry_n, schro_off, npx, npy, n_chunks,
                    batched=False):
    """Backward pass over the recording: suffix EDC + RT60 regression moments.

    The grid iterates time chunks in REVERSE (via the pressure index map),
    and samples within each chunk run newest-to-oldest, reproducing the
    reference's backward Schroeder integration order (Analyzer.cpp:250-327)
    — the numerically stable direction (see ops/analyzer.py note).
    ``batched=True``: (B, n_chunks) grid, per-listener blocks routed by the
    BlockSpecs (see :func:`_kernel`).
    """
    c = pl.program_id(1) if batched else pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        zeros = jnp.zeros((npx, npy), jnp.float32)
        s0_ref[:] = zeros
        s1_ref[:] = zeros
        edc_ref[:] = zeros

    onset = onset_ref[:]
    start = onset + float(dry_n + 1)
    end = float(t_real - schro_off)
    log10_scale = float(10.0 / np.log(10.0))

    def body(k, carry):
        edc, s0, s1 = carry
        kk = chunk - 1 - k                       # reverse within the chunk
        t = (n_chunks - 1 - c) * chunk + kk
        tf = t.astype(jnp.float32)
        p = pres_ref[kk].astype(jnp.float32)   # no-op for f32 recordings
        live = (tf < float(t_real)).astype(jnp.float32)
        edc = edc + p * p * live                 # suffix sum incl. current
        y = jnp.log(jnp.maximum(edc, 1e-37)) * log10_scale
        m = ((tf >= start) & (tf < end)).astype(jnp.float32)
        s0 = s0 + m * y
        s1 = s1 + m * (tf - start) * y
        return edc, s0, s1

    # same register-reuse unroll as the sim kernel (see _steps_per_body)
    spb = _steps_per_body(chunk)

    def multi(j, carry):
        for u in range(spb):
            carry = body(j * spb + u, carry)
        return carry

    edc, s0, s1 = jax.lax.fori_loop(
        0, chunk // spb, multi, (edc_ref[:], s0_ref[:], s1_ref[:]))
    edc_ref[:] = edc
    s0_ref[:] = s0
    s1_ref[:] = s1


@functools.partial(jax.jit, static_argnames=("params", "interpret", "chunk",
                                             "state_dtype"))
def _simulate_impl(params: GridParams, beta, refl, pulse,
                   listener_ix, listener_iy,
                   interpret: bool = False, chunk: int = 16,
                   state_dtype=jnp.float32):
    """One simulation pass in a single fused kernel.

    Returns (FdtdResult, (rec_padded, e_dry, e_wet, e_total)). Result grids
    are tile-padded to [npx, npy] >= [nx, ny]; the analyzer only reads the
    [:grid_x, :grid_y] corner, so no crop is needed. ``chunk`` timesteps run
    per grid iteration so the recording is flushed to HBM in chunk-sized
    slabs (amortizing per-iteration DMA cost); results are chunk-invariant.

    ``state_dtype=jnp.bfloat16`` opts into the half-precision wave-state
    mode (see ``_kernel``): coefficients, p/vx/vy and the recording carry
    bf16; onset/flux/energy accumulators and everything the analyzer
    consumes stay f32. The recording (and FdtdResult.pressure) is returned
    in bf16 — half the HBM writeback.
    """
    nx, ny = params.nx, params.ny
    npx = pad_tile(nx, _SUBLANE)
    npy = pad_tile(ny, _LANE)
    T = params.response_length
    T_pad = pad_tile(T, chunk)

    beta_p = jnp.zeros((npx, npy), jnp.float32).at[:nx, :ny].set(beta)
    refl_p = jnp.zeros((npx, npy), jnp.float32).at[:nx, :ny].set(refl)
    Y = admittance(refl_p)

    # static stencil coefficients folding walls + edge ABC — exact: the beta
    # masks are 0/1, so at most one term is live per cell and the folded
    # factors are 0/±1 multiplies (see ops/fdtd.py::stencil_coefficients)
    a_x, b_x, d_x, a_y, b_y, d_y = fdtd_scan.coefficients_from_fields(
        beta_p, Y, params.grid_x, params.grid_y,
        params.boundary_type == BoundaryType.ABSORBING)
    beta_p, a_x, b_x, d_x, a_y, b_y, d_y = (
        arr.astype(state_dtype)
        for arr in (beta_p, a_x, b_x, d_x, a_y, b_y, d_y))

    scal = jnp.array([listener_ix, listener_iy],
                     dtype=jnp.int32).reshape(1, 2)
    pulse2 = jnp.zeros((T_pad, 1), jnp.float32).at[:T, 0].set(
        pulse.astype(jnp.float32))

    kernel = functools.partial(
        _kernel,
        courant=float(params.courant),
        thr=float(params.constants.audible_threshold_gain),
        src_dir_n=float(params.source_dir_samples),
        npx=npx, npy=npy, chunk=chunk, t_real=T,
        dry_n=params.dry_gain_samples, wet_n=params.wet_gain_samples,
        state_dtype=state_dtype)

    field = pl.BlockSpec((npx, npy), lambda c: (0, 0),
                         memory_space=pltpu.VMEM)
    cell = jax.ShapeDtypeStruct((npx, npy), jnp.float32)

    rec, onset, fx, fy, ed, ew, et = pl.pallas_call(
        kernel,
        grid=(T_pad // chunk,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda c: (0, 0), memory_space=pltpu.SMEM),
            field, field, field, field, field, field, field,
            pl.BlockSpec((T_pad, 1), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, npx, npy), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            field, field, field, field, field, field,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, npx, npy), state_dtype),
            cell, cell, cell, cell, cell, cell,
        ],
        scratch_shapes=[
            pltpu.VMEM((npx, npy), state_dtype),
            pltpu.VMEM((npx, npy), state_dtype),
            pltpu.VMEM((npx, npy), state_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=T * npx * npy * 40,
            bytes_accessed=T * npx * npy * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, beta_p, a_x, b_x, d_x, a_y, b_y, d_y, pulse2)

    # crop the T padding (rows past T hold harmless continued simulation,
    # but the analyzer's windows assume exactly response_length rows)
    res = FdtdResult(pressure=rec[:T], onset=onset, flux_x=fx, flux_y=fy)
    return res, (rec, ed, ew, et)


def simulate_pallas(params: GridParams, beta, refl, pulse,
                    listener_ix, listener_iy,
                    interpret: bool = False, chunk: int = 16,
                    state_dtype=jnp.float32) -> FdtdResult:
    """Run one full simulation pass in a single fused kernel (see
    :func:`_simulate_impl` for shapes and the bf16 state mode)."""
    res, _ = _simulate_impl(params, beta, refl, pulse, listener_ix,
                            listener_iy, interpret=interpret, chunk=chunk,
                            state_dtype=state_dtype)
    return res


@functools.partial(jax.jit, static_argnames=("params", "interpret", "chunk",
                                             "state_dtype", "full_pressure"))
def simulate_moments_pallas(params: GridParams, beta, refl, pulse,
                            listener_ix, listener_iy,
                            interpret: bool = False, chunk: int = 16,
                            state_dtype=jnp.float32,
                            full_pressure: bool = False):
    """Sim + analyzer moments entirely in Pallas.

    Returns (FdtdResult, analyzer.Moments): the windowed energies stream
    inside the sim kernel; the RT60 regression moments come from one
    backward pass over the recording (the only re-read of it). Moments are
    always f32, also in the bf16 state mode.

    ``full_pressure=True`` returns the recording UNcropped
    ([T_pad, npx, npy] — the pallas output buffer itself, rows past
    ``response_length`` hold harmless continued simulation): the ``[:T]``
    crop is a full-recording device copy (measured 0.665 ms/pass at the
    headline 192x192@750 grid on v5e — nearly a whole extra device pass),
    so resident-pressure callers that can crop lazily at query time (the
    engine, core/context.py) should. Default stays cropped for exact-[T]
    consumers.
    """
    from planeverb_tpu.ops.analyzer import Moments

    res, (rec_padded, ed, ew, et) = _simulate_impl(
        params, beta, refl, pulse, listener_ix, listener_iy,
        interpret=interpret, chunk=chunk, state_dtype=state_dtype)
    if full_pressure:
        res = FdtdResult(pressure=rec_padded, onset=res.onset,
                         flux_x=res.flux_x, flux_y=res.flux_y)
    npx, npy = ed.shape
    T = params.response_length
    T_pad = rec_padded.shape[0]
    n_chunks = T_pad // chunk

    kernel = functools.partial(
        _moments_kernel,
        chunk=chunk, t_real=T, dry_n=params.dry_gain_samples,
        schro_off=params.schroeder_offset_samples,
        npx=npx, npy=npy, n_chunks=n_chunks)

    field = pl.BlockSpec((npx, npy), lambda c: (0, 0),
                         memory_space=pltpu.VMEM)
    cell = jax.ShapeDtypeStruct((npx, npy), jnp.float32)
    s0, s1 = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            field,
            pl.BlockSpec((chunk, npx, npy),
                         lambda c: (n_chunks - 1 - c, 0, 0),  # reverse time
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[field, field],
        out_shape=[cell, cell],
        scratch_shapes=[pltpu.VMEM((npx, npy), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=T * npx * npy * 8,
            bytes_accessed=T * npx * npy * 4,
            transcendentals=T * npx * npy,
        ),
        interpret=interpret,
    )(res.onset, rec_padded)

    return res, Moments(e_dry=ed, e_wet=ew, e_total=et, s0=s0, s1=s1)


@functools.partial(jax.jit, static_argnames=("params", "interpret", "chunk",
                                             "state_dtype"))
def _simulate_impl_batch(params: GridParams, beta, refl, pulse,
                         lcells, interpret: bool = False, chunk: int = 16,
                         state_dtype=jnp.float32):
    """B listeners in ONE fused kernel launch — the data-parallel
    split-screen mode (VERDICT r3 item 1).

    ``lcells`` is [B, 2] int32 listener cells. The Pallas grid is
    (B, T_pad//chunk): the geometry fields and stencil coefficients are
    folded ONCE and keep constant index maps (VMEM-resident across all B
    listeners), while the per-listener recording/accumulator blocks are
    routed by BlockSpec index maps over flat [B*npx, npy] outputs (flat so
    the kernel body sees the exact single-listener block shapes — results
    are bit-identical to B separate passes, pinned by
    tests/test_fdtd_pallas.py::test_batched_kernel_parity). vs the previous
    ``lax.map`` of B full pipelines this saves B-1 coefficient folds, B-1
    kernel launches and the per-listener XLA glue.

    Returns (rec [B*T_pad, npx, npy], onset, fx, fy, ed, ew, et — each
    flat [B*npx, npy]).
    """
    nx, ny = params.nx, params.ny
    npx = pad_tile(nx, _SUBLANE)
    npy = pad_tile(ny, _LANE)
    T = params.response_length
    T_pad = pad_tile(T, chunk)
    B = lcells.shape[0]
    n_chunks = T_pad // chunk
    # B listeners share one flat recording buffer; the 2^31-1 element limit
    # applies to it as a whole (same footprint definition the context-side
    # fallback guard uses — batch_recording_elements)
    assert batch_recording_elements(params, B, chunk) == B * T_pad * npx * npy
    check_recording_elements(B * T_pad, npx, npy, "batched fused solver")

    beta_p = jnp.zeros((npx, npy), jnp.float32).at[:nx, :ny].set(beta)
    refl_p = jnp.zeros((npx, npy), jnp.float32).at[:nx, :ny].set(refl)
    Y = admittance(refl_p)
    a_x, b_x, d_x, a_y, b_y, d_y = fdtd_scan.coefficients_from_fields(
        beta_p, Y, params.grid_x, params.grid_y,
        params.boundary_type == BoundaryType.ABSORBING)
    beta_p, a_x, b_x, d_x, a_y, b_y, d_y = (
        arr.astype(state_dtype)
        for arr in (beta_p, a_x, b_x, d_x, a_y, b_y, d_y))

    scal = lcells.astype(jnp.int32)                          # [B, 2]
    pulse2 = jnp.zeros((T_pad, 1), jnp.float32).at[:T, 0].set(
        pulse.astype(jnp.float32))

    kernel = functools.partial(
        _kernel,
        courant=float(params.courant),
        thr=float(params.constants.audible_threshold_gain),
        src_dir_n=float(params.source_dir_samples),
        npx=npx, npy=npy, chunk=chunk, t_real=T,
        dry_n=params.dry_gain_samples, wet_n=params.wet_gain_samples,
        state_dtype=state_dtype, batched=True)

    field = pl.BlockSpec((npx, npy), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM)
    cellblk = pl.BlockSpec((npx, npy), lambda b, c: (b, 0),
                           memory_space=pltpu.VMEM)
    cell = jax.ShapeDtypeStruct((B * npx, npy), jnp.float32)

    rec, onset, fx, fy, ed, ew, et = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((B, 2), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            field, field, field, field, field, field, field,
            pl.BlockSpec((T_pad, 1), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, npx, npy),
                         lambda b, c: (b * n_chunks + c, 0, 0),
                         memory_space=pltpu.VMEM),
            cellblk, cellblk, cellblk, cellblk, cellblk, cellblk,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * T_pad, npx, npy), state_dtype),
            cell, cell, cell, cell, cell, cell,
        ],
        scratch_shapes=[
            pltpu.VMEM((npx, npy), state_dtype),
            pltpu.VMEM((npx, npy), state_dtype),
            pltpu.VMEM((npx, npy), state_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * T * npx * npy * 40,
            bytes_accessed=B * T * npx * npy * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, beta_p, a_x, b_x, d_x, a_y, b_y, d_y, pulse2)
    return rec, onset, fx, fy, ed, ew, et


@functools.partial(jax.jit, static_argnames=("params", "interpret", "chunk",
                                             "state_dtype"))
def simulate_pallas_batch(params: GridParams, beta, refl, pulse, lcells,
                          interpret: bool = False, chunk: int = 16,
                          state_dtype=jnp.float32) -> FdtdResult:
    """B-listener batched sim (see :func:`_simulate_impl_batch`): returns
    an FdtdResult with a leading [B] axis on every field (pressure
    [B, T, npx, npy]); per-listener values are bit-identical to
    :func:`simulate_pallas`."""
    rec, onset, fx, fy, _, _, _ = _simulate_impl_batch(
        params, beta, refl, pulse, lcells, interpret=interpret, chunk=chunk,
        state_dtype=state_dtype)
    B = lcells.shape[0]
    npx, npy = onset.shape[0] // B, onset.shape[1]
    T = params.response_length

    def rs(a):
        return a.reshape(B, npx, npy)

    pressure = rec.reshape(B, -1, npx, npy)[:, :T]
    return FdtdResult(pressure=pressure, onset=rs(onset),
                      flux_x=rs(fx), flux_y=rs(fy))


@functools.partial(jax.jit, static_argnames=("params", "interpret", "chunk",
                                             "state_dtype"))
def simulate_moments_pallas_batch(params: GridParams, beta, refl, pulse,
                                  lcells, interpret: bool = False,
                                  chunk: int = 16,
                                  state_dtype=jnp.float32):
    """Batched sim + analyzer moments for B listeners in two kernel
    launches total (see :func:`_simulate_impl_batch`).

    Returns ((onset, fx, fy) each [B, npx, npy], analyzer.Moments with
    [B, npx, npy] grids). The per-listener recordings are internal (the
    backward RT60 pass consumes them); the multi-listener engine mode drops
    them by design (core/context.py::_step_multi).
    """
    from planeverb_tpu.ops.analyzer import Moments

    rec, onset, fx, fy, ed, ew, et = _simulate_impl_batch(
        params, beta, refl, pulse, lcells, interpret=interpret, chunk=chunk,
        state_dtype=state_dtype)
    nx, ny = params.nx, params.ny
    npx = pad_tile(nx, _SUBLANE)
    npy = pad_tile(ny, _LANE)
    T = params.response_length
    B = lcells.shape[0]
    T_pad = rec.shape[0] // B
    n_chunks = T_pad // chunk

    kernel = functools.partial(
        _moments_kernel,
        chunk=chunk, t_real=T, dry_n=params.dry_gain_samples,
        schro_off=params.schroeder_offset_samples,
        npx=npx, npy=npy, n_chunks=n_chunks, batched=True)

    cellblk = pl.BlockSpec((npx, npy), lambda b, c: (b, 0),
                           memory_space=pltpu.VMEM)
    cell = jax.ShapeDtypeStruct((B * npx, npy), jnp.float32)
    s0, s1 = pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            cellblk,
            pl.BlockSpec((chunk, npx, npy),
                         lambda b, c: (b * n_chunks + (n_chunks - 1 - c),
                                       0, 0),              # reverse time
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[cellblk, cellblk],
        out_shape=[cell, cell],
        scratch_shapes=[pltpu.VMEM((npx, npy), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=B * T * npx * npy * 8,
            bytes_accessed=B * T * npx * npy * 4,
            transcendentals=B * T * npx * npy,
        ),
        interpret=interpret,
    )(onset, rec)

    def rs(a):
        return a.reshape(B, npx, npy)

    return ((rs(onset), rs(fx), rs(fy)),
            Moments(e_dry=rs(ed), e_wet=rs(ew), e_total=rs(et),
                    s0=rs(s0), s1=rs(s1)))


@functools.partial(jax.jit,
                   static_argnames=("params", "compute_directions",
                                    "state_dtype", "interpret"))
def pipeline_auto_batch(params: GridParams, beta, refl, pulse, lcells,
                        efree, lpos, compute_directions: bool = True,
                        state_dtype=jnp.float32, interpret: bool = False):
    """Full B-listener pass: batched fused kernel + vmapped assembly.

    The sim and moments run data-parallel in the batched kernels (ONE
    coefficient fold and geometry load for all listeners); the per-cell
    parameter assembly and DOA pass vmap over the listener axis (pure jnp).
    Returns AnalyzerResults with a leading [B] axis on every grid. Requires
    the fused kernel path (fits_vmem); callers fall back to the lax.map of
    full pipelines otherwise (core/context.py::_pipeline_packed_multi).
    """
    from planeverb_tpu.ops import analyzer

    (onset, fx, fy), moments = simulate_moments_pallas_batch(
        params, beta, refl, pulse, lcells, interpret=interpret,
        state_dtype=state_dtype)

    def assemble(mom, onset_b, fx_b, fy_b, lx, lz):
        return analyzer.analyze_moments(
            params, mom, onset_b, fx_b, fy_b, efree, lx, lz,
            compute_directions=compute_directions)

    return jax.vmap(assemble)(moments, onset, fx, fy,
                              lpos[:, 0], lpos[:, 1])


_VMEM_BUDGET_BYTES = 12 << 20  # leave headroom below the ~16 MB/core VMEM
# bf16 routing budget, CALIBRATED to the measured Mosaic compile boundary
# (v5e, r5): bf16-mode kernels carry ~125 B/cell of scoped-stack
# temporaries the explicit estimate cannot see (the 4-step-unroll live
# values unpack to f32 vregs), so the real fused ceiling is ~72k cells —
# estimate 7.38 MB (280x256) compiles, 7.80 MB (296x256) fails. 7 MB
# keeps ~5% margin below the measured pass point; without this, the
# 12 MB budget admitted grids (e.g. 261^2) whose compile crashes at
# Context.step() (found measuring the bf16_capacity bench row).
_VMEM_BUDGET_BYTES_BF16 = 7 << 20


def _kernel_vmem_bytes(params: GridParams, chunk: int = 16,
                       state_dtype=jnp.float32) -> int:
    """Estimated VMEM footprint of the fused kernel: 7 field inputs (beta +
    6 stencil coefficients) + 3 scratch + the double-buffered chunk-sized
    recording block in the state dtype, 6 f32 cell outputs."""
    npx = pad_tile(params.nx, _SUBLANE)
    npy = pad_tile(params.ny, _LANE)
    cells = npx * npy
    sbytes = jnp.dtype(state_dtype).itemsize
    return cells * sbytes * (7 + 3 + 2 * chunk) + cells * 4 * 6


def fits_vmem(params: GridParams, chunk: int = 16,
              state_dtype=jnp.float32) -> bool:
    budget = (_VMEM_BUDGET_BYTES_BF16
              if jnp.dtype(state_dtype) == jnp.bfloat16
              else _VMEM_BUDGET_BYTES)
    return _kernel_vmem_bytes(params, chunk, state_dtype) <= budget


def simulate_auto(params: GridParams, beta, refl, pulse,
                  listener_ix, listener_iy) -> FdtdResult:
    """Fastest solver per platform/size: fused VMEM-resident Pallas kernel
    for grids that fit VMEM, tile-streamed Pallas kernel (ops/fdtd_tiled.py)
    for larger grids on TPU, lax.scan elsewhere."""
    if jax.devices()[0].platform == "tpu":
        if fits_vmem(params):
            return simulate_pallas(params, beta, refl, pulse,
                                   listener_ix, listener_iy)
        from planeverb_tpu.ops.fdtd_tiled import simulate_tiled

        res, _ = simulate_tiled(params, beta, refl, pulse,
                                listener_ix, listener_iy)
        return res
    return fdtd_scan.simulate(params, beta, refl, pulse,
                              listener_ix, listener_iy)


@functools.partial(jax.jit,
                   static_argnames=("params", "compute_directions",
                                    "state_dtype", "full_pressure"))
def pipeline_auto(params: GridParams, beta, refl, pulse,
                  listener_ix, listener_iy, efree, listener_x, listener_z,
                  compute_directions: bool = True,
                  state_dtype=jnp.float32,
                  full_pressure: bool = False):
    """Full pass: sim + analysis, fastest available path per platform.

    Returns (FdtdResult, AnalyzerResults). On TPU the analyzer moments are
    computed in-kernel (no [T, ...] reductions outside Pallas); elsewhere
    the lax.scan solver + jnp moments produce identical semantics.

    ``state_dtype=jnp.bfloat16`` opts the fused kernel into half-precision
    wave state (TPU VMEM-resident path only; the tiled and lax.scan paths
    ignore it — they are the parity references).

    ``full_pressure=True`` keeps FdtdResult.pressure UNcropped (the
    [T_pad(, band/lane-padded)] recording buffer itself — crop at query
    time): the ``[:T]`` crop is a full-recording device copy per pass
    (see :func:`simulate_moments_pallas`). No-op on the CPU scan path,
    whose recording is exactly [T].

    The whole pass compiles as ONE program: on the tunneled TPU backend
    each jitted call pays a fixed dispatch round-trip, and staging
    sim/moments/assembly as separate calls measured 9.3 ms where this
    single program measures 4.3 ms (same math — the difference is pure
    inter-call overhead, plus XLA overlapping the assembly with the
    solver's recording writeback).
    """
    from planeverb_tpu.ops import analyzer

    if jax.devices()[0].platform == "tpu":
        if fits_vmem(params, state_dtype=state_dtype):
            res, moments = simulate_moments_pallas(
                params, beta, refl, pulse, listener_ix, listener_iy,
                state_dtype=state_dtype, full_pressure=full_pressure)
        else:
            from planeverb_tpu.ops.fdtd_tiled import simulate_moments_tiled

            res, moments = simulate_moments_tiled(
                params, beta, refl, pulse, listener_ix, listener_iy,
                full_pressure=full_pressure)
    else:
        res = fdtd_scan.simulate(params, beta, refl, pulse,
                                 listener_ix, listener_iy)
        moments = analyzer.moments_from_pressure(params, res.pressure,
                                                 res.onset)
    out = analyzer.analyze_moments(params, moments, res.onset, res.flux_x,
                                   res.flux_y, efree, listener_x, listener_z,
                                   compute_directions=compute_directions)
    return res, out
