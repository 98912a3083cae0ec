"""Sharded Pallas FDTD solver — fused kernel rounds between halo exchanges.

The lax.scan sharded solvers (parallel/solver.py) are dispatch-bound on real
TPUs for the same reason the single-chip scan solver is (ops/fdtd_pallas.py
header): each timestep is a handful of tiny VPU ops, so per-step XLA loop
overhead (~33 us/step measured on v5e) dominates the ~1 us of compute. This
module marries the two existing designs:

  - ``simulate_sharded_wide``'s k-step halo widening: each shard extends its
    block with ``halo``-cell ghost regions (ppermute, corners included) and
    can then advance ``halo`` timesteps with zero communication;
  - ``simulate_pallas``'s launch amortization: those ``halo`` steps run
    inside ONE ``pallas_call`` per round with the wave state resident in
    VMEM, and the per-step pressure recording streamed back to HBM in
    ``chunk``-step blocks double-buffered by Mosaic.

Per round of k steps each shard pays one halo exchange (4 ppermute slabs) and
one kernel launch instead of k of each — the collective count of the wide
solver with the per-step cost of the fused kernel. Stencil coefficients are
folded once per simulation (they are static per geometry) on the
ghost-extended block, exactly as in the wide solver, so ghost cells evolve
bit-identically to their owning shard's real cells between exchanges.
Measured on one v5e chip (1x1 mesh, 192x192 @ 1187 steps): 5.9 ms/pass,
bit-identical to the 4.7 ms fused single-chip kernel — the ~25% round
machinery is what multi-chip scaling buys against.

Like the fused kernel, every round also streams the analyzer's windowed
energies (dry/wet/total) in-kernel, and ``simulate_moments_sharded`` adds
the backward RT60 regression pass per shard — the full multi-chip pipeline
needs no [T, nx, ny] analysis reductions outside Pallas.

Semantics match ops/fdtd.py::simulate (reference
ProjectPlaneverb/src/FDTD/FDTD.cpp:87-236) and are pinned by parity tests
against ``simulate_sharded`` on the 8-device CPU mesh.

Performance layout note: a 1D ("x", N) mesh is the fast configuration on
TPU — halo slabs are then contiguous [k, by] row blocks (sublane-dimension
slicing only) and the lane dimension stays unsliced. 2D meshes work but pay
lane-dimension relayouts on the y halos.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from planeverb_tpu.config import BoundaryType, GridParams
from planeverb_tpu.ops.fdtd import (FdtdResult, admittance,
                                    stencil_coefficients)
from planeverb_tpu.ops.fdtd_pallas import _moments_kernel
from planeverb_tpu.parallel.solver import _exchange_halo

__all__ = ["simulate_sharded_pallas", "simulate_moments_sharded",
           "pipeline_sharded", "sharded_kernel_vmem_bytes"]


def _round_kernel(t0_ref, pulse_ref, beta_ref, ax_ref, bxc_ref, dx_ref,
                  ay_ref, byc_ref, dy_ref, src_ref,
                  p_in, vx_in, vy_in, onset_in, fx_in, fy_in,
                  ed_in, ew_in, et_in,
                  rec_ref, p_out, vx_out, vy_out,
                  onset_ref, fx_ref, fy_ref, ed_ref, ew_ref, et_ref,
                  p_s, vx_s, vy_s,
                  *, courant, thr, src_dir_n, t_real, dry_n, wet_n,
                  chunk, n_chunks, k, bx, by):
    """Advance ``chunk`` steps of one k-step round on the ghost-extended
    block. Wave state lives in extended VMEM scratch across the round's grid
    iterations; onset/flux/windowed energies accumulate in interior-sized
    VMEM-resident outputs; the recording streams out in chunk-sized blocks.
    The moment window expressions are the fused single-chip kernel's
    (ops/fdtd_pallas.py::_kernel) with the per-round time offset."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        p_s[:] = p_in[:]
        vx_s[:] = vx_in[:]
        vy_s[:] = vy_in[:]
        onset_ref[:] = onset_in[:]
        fx_ref[:] = fx_in[:]
        fy_ref[:] = fy_in[:]
        ed_ref[:] = ed_in[:]
        ew_ref[:] = ew_in[:]
        et_ref[:] = et_in[:]

    beta = beta_ref[:]
    a_x = ax_ref[:]
    b_x = bxc_ref[:]
    d_x = dx_ref[:]
    a_y = ay_ref[:]
    b_y = byc_ref[:]
    d_y = dy_ref[:]
    src = src_ref[:]
    bxe, bye = beta.shape
    zrow = jnp.zeros((1, bye), jnp.float32)
    zcol = jnp.zeros((bxe, 1), jnp.float32)
    t0 = t0_ref[0, 0]
    interior = (slice(k, k + bx), slice(k, k + by))

    def one_step(s, carry):
        p, vx, vy, onset, fx, fy, ed, ew, et = carry
        t = t0 + c * chunk + s

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

        # -- streaming onset / flux / windowed energies on the interior
        # (fused-kernel scalar-bound form, ops/fdtd_pallas.py:113-132)
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
        ew = jnp.where((onset <= c_wet_lo) & (onset > c_wet_hi), ew + sq, ew)
        et = jnp.where(live, et + sq, et)

        # record (pre-injection), then inject at the listener cell
        rec_ref[s] = p_int
        p = p + src * pulse_ref[c * chunk + s, 0]
        return p, vx, vy, onset, fx, fy, ed, ew, et

    carry = (p_s[:], vx_s[:], vy_s[:], onset_ref[:], fx_ref[:], fy_ref[:],
             ed_ref[:], ew_ref[:], et_ref[:])
    p, vx, vy, onset, fx, fy, ed, ew, et = jax.lax.fori_loop(
        0, chunk, one_step, carry)
    p_s[:] = p
    vx_s[:] = vx
    vy_s[:] = vy
    onset_ref[:] = onset
    fx_ref[:] = fx
    fy_ref[:] = fy
    ed_ref[:] = ed
    ew_ref[:] = ew
    et_ref[:] = et

    @pl.when(c == n_chunks - 1)
    def _finish():
        p_out[:] = p_s[interior]
        vx_out[:] = vx_s[interior]
        vy_out[:] = vy_s[interior]


def sharded_kernel_vmem_bytes(bx: int, by: int, halo: int,
                              chunk: int) -> int:
    """Estimated VMEM footprint of one round's kernel per shard: 11 extended
    constant/state inputs + 3 extended scratch, 12 interior accumulator
    blocks + 3 interior state outputs, plus the double-buffered chunk-sized
    recording block."""
    ext = (bx + 2 * halo) * (by + 2 * halo) * 4
    cell = bx * by * 4
    return ext * (11 + 3) + cell * 15 + 2 * chunk * cell


def _simulate_impl(params: GridParams, beta, refl, pulse,
                   listener_ix, listener_iy, mesh: Mesh,
                   nx_pad: int, ny_pad: int, halo: int,
                   chunk: int | None, interpret: bool,
                   with_moments: bool):
    gx, gy = params.grid_x, params.grid_y
    absorbing = params.boundary_type == BoundaryType.ABSORBING
    T = params.response_length
    k = halo
    if chunk is None:
        chunk = min(k, 16)
    if k % chunk != 0:
        raise ValueError(f"chunk {chunk} must divide halo {k}")
    n_chunks = k // chunk
    rounds = -(-T // k)
    T_pad = rounds * k
    mx = mesh.shape["x"]
    my = mesh.shape["y"]
    bx = nx_pad // mx
    by = ny_pad // my
    if k > bx or k > by:
        raise ValueError(f"halo {k} exceeds shard block ({bx}, {by})")
    bxe, bye = bx + 2 * k, by + 2 * k

    kernel = functools.partial(
        _round_kernel,
        courant=float(params.courant),
        thr=float(params.constants.audible_threshold_gain),
        src_dir_n=float(params.source_dir_samples),
        t_real=T, dry_n=params.dry_gain_samples,
        wet_n=params.wet_gain_samples,
        chunk=chunk, n_chunks=n_chunks, k=k, bx=bx, by=by)

    ext = pl.BlockSpec((bxe, bye), lambda c: (0, 0), memory_space=pltpu.VMEM)
    cell = pl.BlockSpec((bx, by), lambda c: (0, 0), memory_space=pltpu.VMEM)
    cell_t = jax.ShapeDtypeStruct((bx, by), jnp.float32)

    run_round = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
            ext, ext, ext, ext, ext, ext, ext, ext,   # beta, 6 coefs, src
            ext, ext, ext,                            # p, vx, vy (extended)
            cell, cell, cell, cell, cell, cell,       # onset,fx,fy,ed,ew,et
        ],
        out_specs=[
            pl.BlockSpec((chunk, bx, by), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            cell, cell, cell,                         # p, vx, vy interior
            cell, cell, cell, cell, cell, cell,       # onset,fx,fy,ed,ew,et
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, bx, by), jnp.float32),
            cell_t, cell_t, cell_t,
            cell_t, cell_t, cell_t, cell_t, cell_t, cell_t,
        ],
        scratch_shapes=[
            pltpu.VMEM((bxe, bye), jnp.float32),
            pltpu.VMEM((bxe, bye), jnp.float32),
            pltpu.VMEM((bxe, bye), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=k * bxe * bye * 44,
            bytes_accessed=k * bx * by * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    n_chunks_m = T_pad // chunk
    run_moments = pl.pallas_call(
        functools.partial(
            _moments_kernel, chunk=chunk, t_real=T,
            dry_n=params.dry_gain_samples,
            schro_off=params.schroeder_offset_samples,
            npx=bx, npy=by, n_chunks=n_chunks_m),
        grid=(n_chunks_m,),
        in_specs=[
            cell,
            pl.BlockSpec((chunk, bx, by),
                         lambda c: (n_chunks_m - 1 - c, 0, 0),  # reverse time
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[cell, cell],
        out_shape=[cell_t, cell_t],
        scratch_shapes=[pltpu.VMEM((bx, by), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=T_pad * bx * by * 8,
            bytes_accessed=T_pad * bx * by * 4,
            transcendentals=T_pad * bx * by,
        ),
        interpret=interpret,
    )

    def local_sim(beta, Y, pulse, lix, liy):
        px = jax.lax.axis_index("x")
        py = jax.lax.axis_index("y")
        # global coordinates of the extended block (wide-solver layout)
        gi = (px * bx - k
              + jax.lax.broadcasted_iota(jnp.int32, (bxe, bye), 0))
        gj = (py * by - k
              + jax.lax.broadcasted_iota(jnp.int32, (bxe, bye), 1))

        beta_e = _exchange_halo(beta, k)
        y_e = _exchange_halo(Y, k)
        zrow = jnp.zeros((1, bye), jnp.float32)
        zcol = jnp.zeros((bxe, 1), jnp.float32)
        b_xm = jnp.concatenate([zrow, beta_e[:-1]], axis=0)
        y_xm = jnp.concatenate([zrow, y_e[:-1]], axis=0)
        b_ym = jnp.concatenate([zcol, beta_e[:, :-1]], axis=1)
        y_ym = jnp.concatenate([zcol, y_e[:, :-1]], axis=1)
        # folded once per simulation; fringe-row shift artifacts are
        # discarded by the k-step halo argument (parallel/solver.py:252-256)
        a_x, b_x, d_x, a_y, b_y, d_y = stencil_coefficients(
            beta_e, y_e, b_xm, y_xm, b_ym, y_ym, gi, gj, gx, gy, absorbing)
        src_mask = ((gi == lix) & (gj == liy)).astype(jnp.float32)

        z_int = jnp.zeros((bx, by), jnp.float32)
        onset0 = jnp.full((bx, by), jnp.inf, jnp.float32)
        t0s = (jnp.arange(rounds, dtype=jnp.int32) * k).reshape(rounds, 1, 1)
        pulse_pad = jnp.zeros(T_pad, jnp.float32).at[:T].set(pulse)
        pulse_rounds = pulse_pad.reshape(rounds, k, 1)

        def one_round(carry, xt):
            p_i, vx_i, vy_i, onset, fx, fy, ed, ew, et = carry
            t0, pulse_k = xt
            p_e = _exchange_halo(p_i, k)
            vx_e = _exchange_halo(vx_i, k)
            vy_e = _exchange_halo(vy_i, k)
            (rec, p2, vx2, vy2, onset2, fx2, fy2,
             ed2, ew2, et2) = run_round(
                t0, pulse_k, beta_e, a_x, b_x, d_x, a_y, b_y, d_y,
                src_mask, p_e, vx_e, vy_e, onset, fx, fy, ed, ew, et)
            return (p2, vx2, vy2, onset2, fx2, fy2, ed2, ew2, et2), rec

        carry0 = (z_int, z_int, z_int, onset0,
                  z_int, z_int, z_int, z_int, z_int)
        (_, _, _, onset, fx, fy, ed, ew, et), recs = jax.lax.scan(
            one_round, carry0, (t0s, pulse_rounds))
        recs = recs.reshape(T_pad, bx, by)
        pressure = recs[:T]
        if not with_moments:
            return pressure, onset, fx, fy
        # backward RT60 regression pass, fully shard-local (the recording
        # never leaves the shard): suffix EDC + regression moments
        s0, s1 = run_moments(onset, recs)
        return pressure, onset, fx, fy, ed, ew, et, s0, s1

    grid2 = P("x", "y")
    n_out = 9 if with_moments else 4
    shard = functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(grid2, grid2, P(), P(), P()),
        out_specs=(P(None, "x", "y"),) + (grid2,) * (n_out - 1),
        check_vma=False,
    )
    Y = admittance(refl)
    return shard(local_sim)(beta, Y, pulse, listener_ix, listener_iy)


@functools.partial(
    jax.jit, static_argnames=("params", "mesh", "nx_pad", "ny_pad", "halo",
                              "chunk", "interpret"))
def simulate_sharded_pallas(params: GridParams, beta, refl, pulse,
                            listener_ix, listener_iy, mesh: Mesh,
                            nx_pad: int, ny_pad: int, halo: int = 16,
                            chunk: int | None = None,
                            interpret: bool = False) -> FdtdResult:
    """Run one simulation pass sharded over ``mesh`` at fused-kernel rates.

    Same contract as :func:`planeverb_tpu.parallel.simulate_sharded`
    (padded [T, nx_pad, ny_pad] pressure + [nx_pad, ny_pad] onset/flux;
    crop to params.nx/ny for analysis). ``halo`` is the exchange period k;
    ``chunk`` (divides halo, default min(halo, 16)) is the recording
    writeback granularity inside each round's kernel.
    """
    pressure, onset, fx, fy = _simulate_impl(
        params, beta, refl, pulse, listener_ix, listener_iy, mesh,
        nx_pad, ny_pad, halo, chunk, interpret, with_moments=False)
    return FdtdResult(pressure=pressure, onset=onset, flux_x=fx, flux_y=fy)


@functools.partial(
    jax.jit, static_argnames=("params", "mesh", "nx_pad", "ny_pad", "halo",
                              "chunk", "interpret"))
def simulate_moments_sharded(params: GridParams, beta, refl, pulse,
                             listener_ix, listener_iy, mesh: Mesh,
                             nx_pad: int, ny_pad: int, halo: int = 16,
                             chunk: int | None = None,
                             interpret: bool = False):
    """Sharded sim + in-kernel analyzer moments (multi-chip analog of
    ops/fdtd_pallas.py::simulate_moments_pallas).

    Returns (FdtdResult, analyzer.Moments) with every grid padded to
    [nx_pad, ny_pad]; the windowed energies stream inside the round kernel
    and the RT60 regression moments come from one shard-local backward pass
    over each shard's recording — no cross-device analysis traffic.
    """
    from planeverb_tpu.ops.analyzer import Moments

    pressure, onset, fx, fy, ed, ew, et, s0, s1 = _simulate_impl(
        params, beta, refl, pulse, listener_ix, listener_iy, mesh,
        nx_pad, ny_pad, halo, chunk, interpret, with_moments=True)
    res = FdtdResult(pressure=pressure, onset=onset, flux_x=fx, flux_y=fy)
    return res, Moments(e_dry=ed, e_wet=ew, e_total=et, s0=s0, s1=s1)


def pipeline_sharded(params: GridParams, beta, refl, pulse,
                     listener_ix, listener_iy, mesh: Mesh,
                     nx_pad: int, ny_pad: int, efree,
                     listener_x, listener_z, halo: int = 16,
                     chunk: int | None = None, interpret: bool = False,
                     compute_directions: bool = True):
    """Full multi-chip pass: sharded sim + in-kernel moments + parameter
    assembly. Returns (FdtdResult, AnalyzerResults) — the multi-chip analog
    of ops/fdtd_pallas.py::pipeline_auto; results are cropped to the
    analysis grid."""
    from planeverb_tpu.ops import analyzer

    res, moments = simulate_moments_sharded(
        params, beta, refl, pulse, listener_ix, listener_iy, mesh,
        nx_pad, ny_pad, halo=halo, chunk=chunk, interpret=interpret)
    nx, ny = params.nx, params.ny
    crop = analyzer.Moments(
        e_dry=moments.e_dry[:nx, :ny], e_wet=moments.e_wet[:nx, :ny],
        e_total=moments.e_total[:nx, :ny], s0=moments.s0[:nx, :ny],
        s1=moments.s1[:nx, :ny])
    out = analyzer.analyze_moments(
        params, crop, res.onset[:nx, :ny], res.flux_x[:nx, :ny],
        res.flux_y[:nx, :ny], efree, listener_x, listener_z,
        compute_directions=compute_directions)
    return res, out
