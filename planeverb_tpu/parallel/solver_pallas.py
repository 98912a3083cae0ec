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
ghost-extended block (or in-window for the banded path), so ghost cells
evolve bit-identically to their owning shard's real cells between
exchanges. Measured on one v5e chip (1x1 mesh, 192x192 @ 1187 steps, r4):
~4 ms/pass, bit-identical to the 0.76 ms fused single-chip device pass —
the per-round machinery (state round-trips + ppermute + launch, ~75
rounds at halo=16) is what multi-chip scaling buys against; BASELINE.md
"Projected scaling" models the resulting efficiency per chip count.

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

r5 additions: ghost widths are PER-AXIS (an unsharded axis carries no
ghosts — a 1x1 mesh therefore measures the pure round machinery, which is
what the projected-efficiency model calibrates against); `overlap=True`
restructures 1D-mesh rounds boundary-first so the frame ppermute runs
concurrently with the interior kernel (:func:`_overlap_impl`, bit-identical
to the plain rounds); and exchange-free beyond-VMEM 1x1 shards route to the
tiled kernel (:func:`_delegate_tiled_1x1`).
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
from planeverb_tpu.ops.fdtd_pallas import (_VMEM_BUDGET_BYTES,
                                           _moments_kernel, _steps_per_body,
                                           check_recording_elements)
from planeverb_tpu.ops.fdtd_tiled import _tiled_moments_kernel
from planeverb_tpu.parallel.solver import (_exchange_axes, _exchange_halo,
                                           _from_next, _from_prev)

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
                  chunk, n_chunks, kx, ky, bx, by):
    """Advance ``chunk`` steps of one k-step round on the ghost-extended
    block. Wave state lives in extended VMEM scratch across the round's grid
    iterations; onset/flux/windowed energies accumulate in interior-sized
    VMEM-resident outputs; the recording streams out in chunk-sized blocks.
    The moment window expressions are the fused single-chip kernel's
    (ops/fdtd_pallas.py::_kernel) with the per-round time offset.

    ``kx``/``ky`` are the per-axis ghost (or doomed-fringe) widths: the
    window is [kx | bx interior | kx] x [ky | by | ky] and only the
    interior survives the round. r5 made them per-axis so an UNsharded
    mesh axis carries no ghosts at all (its window edge IS the global
    edge, handled by the zero-neighbor shifts exactly as in the fused
    single-chip kernel) — a 1D (N, 1) mesh stops paying 2k ghost columns
    of compute per round, and the overlap path reuses the same kernel for
    its boundary-frame and interior windows (kx = k, ky = 0, bx = frame
    or interior rows)."""
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
    interior = (slice(kx, kx + bx), slice(ky, ky + by))

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
    # register-reuse unroll (ops/fdtd_pallas.py::_steps_per_body): several
    # steps per fori body keep the 9 carries in registers across the group;
    # bit-identical (same ops, same order)
    spb = _steps_per_body(chunk)

    def multi_step(j, carry):
        for u in range(spb):
            carry = one_step(j * spb + u, carry)
        return carry

    p, vx, vy, onset, fx, fy, ed, ew, et = jax.lax.fori_loop(
        0, chunk // spb, multi_step, carry)
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
                              chunk: int, kx: int | None = None,
                              ky: int | None = None) -> int:
    """Estimated VMEM footprint of one round's kernel per shard: 11 extended
    constant/state inputs + 3 extended scratch, 12 interior accumulator
    blocks + 3 interior state outputs, plus the double-buffered chunk-sized
    recording block. ``kx``/``ky`` default to ``halo`` (the symmetric
    worst case callers like Context use for routing); the solver passes
    the actual per-axis ghost widths (0 on unsharded axes)."""
    kx = halo if kx is None else kx
    ky = halo if ky is None else ky
    ext = (bx + 2 * kx) * (by + 2 * ky) * 4
    cell = bx * by * 4
    return ext * (11 + 3) + cell * 15 + 2 * chunk * cell


def _banded_round_kernel(t0_ref, pulse_ref, geo_ref,
                         beta_hbm, y_hbm,
                         p_hbm, vx_hbm, vy_hbm,
                         onset_in, fx_in, fy_in, ed_in, ew_in, et_in,
                         rec_hbm, p_out, vx_out, vy_out,
                         onset_out, fx_out, fy_out,
                         ed_out, ew_out, et_out,
                         *, courant, thr, src_dir_n, t_real, dry_n, wet_n,
                         k, bb, w, gx, gy, absorbing,
                         win_stride=None, geo_stride=None, out_stride=None):
    """One k-step round for shards beyond VMEM: band-streamed HBM state.

    Per-step math and moment windows are identical to :func:`_round_kernel`
    (and therefore to the fused single-chip kernel); only the memory
    movement differs. The ghost-extended block and accumulators live in HBM
    (Mosaic DMA operands, never whole-block VMEM); each grid step processes
    one ``bb``-row band of the interior, DMAing its window — the band rows
    plus a k-row halo on each side — into VMEM, advancing all k steps of
    the round locally (stencil radius 1/step, so the k-row band halo stays
    exact for k steps — the same argument that justifies the shard-level
    ppermute halo, parallel/solver.py, and the band streaming of
    ops/fdtd_tiled.py), then writing back the band's rows of state,
    accumulators, and k-step recording. Bands are independent within a
    round: they all read round-start state and write disjoint rows.

    Stencil coefficients fold IN-WINDOW from the beta/admittance windows
    (ops/fdtd.py::stencil_coefficients on window shifts + global coords
    from ``geo_ref`` = [gi0, gj0, lix, liy]), exactly as ops/fdtd_tiled.py
    does: streaming 2 geometry planes per band instead of the r3 design's
    8 precomputed planes cuts the dominant per-band HBM traffic ~2x.
    Window-edge shift artifacts only ever contaminate the outermost halo
    row per step, which the k-step halo argument already discards, so the
    fold is bit-identical on every surviving row.

    Every array here spans the FULL lane-padded extended width ``w``
    (a 128 multiple covering interior + y ghosts + alignment pad): Mosaic
    requires DMA slices to be lane-aligned, so the lane dimension is never
    sliced — callers pad the extended arrays to ``w`` columns and crop
    columns [k, k+by) afterwards. Pad cells are NOT guaranteed silent:
    beta = Y = 0 zeroes the wall terms there, but the fold's edge-ABC
    overrides (gi == gx / gj == gy) and the source mask are
    beta-independent, and on multi-shard meshes pad cells carry real
    global coordinates past the shard edge — a pad cell can therefore
    develop nonzero velocity. Correctness rests on the cone argument
    alone: pads start each round at exactly zero (the caller re-pads
    after every halo exchange) and sit >= k+1 cells from the interior,
    so any in-round pad activity cannot reach a surviving cell within
    the k steps of a round (verified bit-equal to the fused rounds on
    v5e and on multi-shard CPU meshes). Row DMAs stay aligned as long
    as ``bb`` and ``k`` are both multiples of 8 (reads slice at offsets
    tb*bb; the round-end writes slice the VMEM window at row offset k) —
    :func:`_pick_shard_band` and the default halo=16 satisfy both.

    Band indexing is decoupled per use (r5, for the banded OVERLAP
    split's frame launch, whose input windows / output rows / global rows
    advance at different strides): ``win_stride`` positions the input
    window (default ``bb``), ``out_stride`` the output/accumulator rows
    (default ``bb``), and ``geo_stride`` the global row of the window's
    first row relative to ``geo_ref[0, 0]`` (default ``bb``). The plain
    path leaves all three at ``bb`` — identical indexing to r4.
    """
    tb = pl.program_id(0)
    wrows = bb + 2 * k
    win_stride = bb if win_stride is None else win_stride
    geo_stride = bb if geo_stride is None else geo_stride
    out_stride = bb if out_stride is None else out_stride

    def body(pw, vxw, vyw, bw, yw,
             onset_t, fx_t, fy_t, ed_t, ew_t, et_t, rec_t, sems):
        row = tb * win_stride   # window start in the input arrays
        irow = tb * out_stride  # band start in the output-row arrays

        ext_pairs = ((beta_hbm, bw), (y_hbm, yw),
                     (p_hbm, pw), (vx_hbm, vxw), (vy_hbm, vyw))
        int_pairs = ((onset_in, onset_t), (fx_in, fx_t), (fy_in, fy_t),
                     (ed_in, ed_t), (ew_in, ew_t), (et_in, et_t))
        loads = [pltpu.make_async_copy(s.at[pl.ds(row, wrows)], d,
                                       sems.at[i])
                 for i, (s, d) in enumerate(ext_pairs)]
        loads += [pltpu.make_async_copy(s.at[pl.ds(irow, bb)], d,
                                        sems.at[len(ext_pairs) + i])
                  for i, (s, d) in enumerate(int_pairs)]
        for dma in loads:
            dma.start()
        for dma in loads:
            dma.wait()

        beta = bw[:]
        Y = yw[:]
        zrow = jnp.zeros((1, w), jnp.float32)
        zcol = jnp.zeros((wrows, 1), jnp.float32)

        # in-window coefficient fold (see docstring): global coords of
        # window row/col 0 come from the shard origin + band offset
        gi = (geo_ref[0, 0] + tb * geo_stride
              + jax.lax.broadcasted_iota(jnp.int32, (wrows, w), 0))
        gj = (geo_ref[0, 1]
              + jax.lax.broadcasted_iota(jnp.int32, (wrows, w), 1))
        b_xm = jnp.concatenate([zrow, beta[:-1]], axis=0)
        y_xm = jnp.concatenate([zrow, Y[:-1]], axis=0)
        b_ym = jnp.concatenate([zcol, beta[:, :-1]], axis=1)
        y_ym = jnp.concatenate([zcol, Y[:, :-1]], axis=1)
        a_x, b_x, d_x, a_y, b_y, d_y = stencil_coefficients(
            beta, Y, b_xm, y_xm, b_ym, y_ym, gi, gj, gx, gy, absorbing)
        src = ((gi == geo_ref[0, 2])
               & (gj == geo_ref[0, 3])).astype(jnp.float32)
        t0 = t0_ref[0, 0]
        band = slice(k, k + bb)

        def one_step(s, carry):
            p, vx, vy, onset, fx, fy, ed, ew, et = carry
            t = t0 + s

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

            tf = t.astype(jnp.float32)
            live = tf < float(t_real)
            t_on = jnp.where(live, tf, jnp.inf)
            c_flux = jnp.where(live, tf - src_dir_n, jnp.inf)
            c_dry = jnp.where(live, tf - float(dry_n), jnp.inf)
            c_wet_lo = jnp.where(live, tf - float(dry_n) - 1.0, -jnp.inf)
            c_wet_hi = tf - float(dry_n) - 1.0 - float(wet_n)

            p_b = p[band]
            onset = jnp.minimum(
                onset, jnp.where(jnp.abs(p_b) > thr, t_on, jnp.inf))
            mp = jnp.where(onset > c_flux, p_b, 0.0)
            fx = fx + mp * vx[band]
            fy = fy + mp * vy[band]
            sq = p_b * p_b
            ed = jnp.where(onset > c_dry, ed + sq, ed)
            ew = jnp.where((onset <= c_wet_lo) & (onset > c_wet_hi),
                           ew + sq, ew)
            et = jnp.where(live, et + sq, et)

            rec_t[s] = p_b
            p = p + src * pulse_ref[s, 0]
            return p, vx, vy, onset, fx, fy, ed, ew, et

        carry = (pw[:], vxw[:], vyw[:], onset_t[:], fx_t[:], fy_t[:],
                 ed_t[:], ew_t[:], et_t[:])
        # register-reuse unroll (ops/fdtd_pallas.py::_steps_per_body)
        spb = _steps_per_body(k)

        def multi_step(j, carry):
            for u in range(spb):
                carry = one_step(j * spb + u, carry)
            return carry

        p, vx, vy, onset, fx, fy, ed, ew, et = jax.lax.fori_loop(
            0, k // spb, multi_step, carry)
        pw[:] = p
        vxw[:] = vx
        vyw[:] = vy
        onset_t[:] = onset
        fx_t[:] = fx
        fy_t[:] = fy
        ed_t[:] = ed
        ew_t[:] = ew
        et_t[:] = et

        band_rows = pl.ds(k, bb)
        writes = [
            pltpu.make_async_copy(
                pw.at[band_rows], p_out.at[pl.ds(irow, bb)], sems.at[0]),
            pltpu.make_async_copy(
                vxw.at[band_rows], vx_out.at[pl.ds(irow, bb)], sems.at[1]),
            pltpu.make_async_copy(
                vyw.at[band_rows], vy_out.at[pl.ds(irow, bb)], sems.at[2]),
            pltpu.make_async_copy(
                onset_t, onset_out.at[pl.ds(irow, bb)], sems.at[3]),
            pltpu.make_async_copy(
                fx_t, fx_out.at[pl.ds(irow, bb)], sems.at[4]),
            pltpu.make_async_copy(
                fy_t, fy_out.at[pl.ds(irow, bb)], sems.at[5]),
            pltpu.make_async_copy(
                ed_t, ed_out.at[pl.ds(irow, bb)], sems.at[6]),
            pltpu.make_async_copy(
                ew_t, ew_out.at[pl.ds(irow, bb)], sems.at[7]),
            pltpu.make_async_copy(
                et_t, et_out.at[pl.ds(irow, bb)], sems.at[8]),
            pltpu.make_async_copy(
                rec_t, rec_hbm.at[pl.ds(0, k), pl.ds(irow, bb)],
                sems.at[9]),
        ]
        for dma in writes:
            dma.start()
        for dma in writes:
            dma.wait()

    pl.run_scoped(
        body,
        pw=pltpu.VMEM((wrows, w), jnp.float32),
        vxw=pltpu.VMEM((wrows, w), jnp.float32),
        vyw=pltpu.VMEM((wrows, w), jnp.float32),
        bw=pltpu.VMEM((wrows, w), jnp.float32),
        yw=pltpu.VMEM((wrows, w), jnp.float32),
        onset_t=pltpu.VMEM((bb, w), jnp.float32),
        fx_t=pltpu.VMEM((bb, w), jnp.float32),
        fy_t=pltpu.VMEM((bb, w), jnp.float32),
        ed_t=pltpu.VMEM((bb, w), jnp.float32),
        ew_t=pltpu.VMEM((bb, w), jnp.float32),
        et_t=pltpu.VMEM((bb, w), jnp.float32),
        rec_t=pltpu.VMEM((k, bb, w), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((11,)),
    )


def _pick_shard_band(bx: int, w: int, k: int,
                     band_rows: int | None) -> int:
    """Band height for the beyond-VMEM round kernel.

    The interior is row-padded to a band multiple (pad rows carry zero
    coefficients, appended after the ghosts, so they are inert and
    cropped), which frees the choice: any multiple of 8 (sublane-aligned
    DMA offsets) works, so pick the largest whose kernel VMEM footprint —
    ~26 window-height live arrays (11 DMA windows + 9 fori carries +
    temporaries) plus the accumulator tiles and the k-step recording slab —
    fits the budget.

    History: the r3 kernel (11 DMA'd planes per window) made Mosaic
    compile time explode with window height (12-14 MINUTES at bb=32), so
    the budget was pinned to a conservative 4 MB picking bb=16. The r4
    in-window coefficient fold shrank the kernel to 5 DMA'd planes — the
    compile explosion vanished (bb=32/48 compile in SECONDS on v5e) — so
    the budget now targets the measured sweet spot: the same 459x459
    shard sweep gives bb=16 -> 10.8 G, bb=24 -> 12.0 G, bb=32 -> 12.7 G,
    bb=48 -> 13.5 G (less redundant halo-row compute per band). The
    footprint still counts ~26 window-height live arrays: the folded
    coefficient planes stopped being DMA windows but remain live values
    across the k-step loop (5 windows + ~7 fold results/temporaries + 9
    fori carries + slack)."""
    if band_rows is not None:
        if band_rows <= 0:
            raise ValueError(f"band_rows {band_rows} must be positive")
        return band_rows
    budget = 15 << 19   # 7.5 MB

    def footprint(bb):
        return ((bb + 2 * k) * 26 + bb * 14 + k * bb) * w * 4

    bb = 8
    while bb < bx and footprint(bb + 8) <= budget:
        bb += 8
    # cap at the largest band height validated on hardware (the 459^2
    # sweep topped out at 48; beyond-measured windows stay opt-in via
    # band_rows)
    bb = min(bb, 48)
    return min(bb, max(8, -(-bx // 8) * 8))


def _overlap_impl(params: GridParams, beta, refl, pulse,
                  listener_ix, listener_iy, mesh: Mesh,
                  bx: int, by: int, k: int, chunk: int,
                  interpret: bool, with_moments: bool,
                  with_pressure: bool = True,
                  full_pressure: bool = False):
    """Rounds with halo exchange OVERLAPPED by interior compute (r5).

    The plain rounds are strictly sequential per round: exchange ghosts,
    then advance the whole extended block k steps — so every round eats
    the full communication latency (VERDICT r4 weak #5: fixed DCN latency
    plus ghost compute kill >=4-host efficiency, and overlap is the named
    remedy). This path restructures each round into the classic
    boundary-first split for 1D ("x", N) meshes (the documented fast mesh
    layout — y stays unsharded, so slabs are contiguous row blocks):

      1. two FRAME kernels advance the k top / k bottom rows using last
         round's ghosts (window [ghost k | frame k | inner k] — the inner
         k rows are the doomed fringe that keeps the frame exact);
      2. the new frames' ppermute starts — it depends ONLY on the frame
         kernels;
      3. the INTERIOR kernel advances the remaining bx-2k rows from
         round-start state (window = the whole block; the frame rows are
         its doomed fringe) — it has NO data dependency on the permute,
         so XLA's async-collective scheduling is free to run the exchange
         underneath it.

    Per round: t = t_frame + max(t_comm, t_interior) instead of
    t_comm + t_ext_block — communication is hidden whenever it is shorter
    than the interior advance (the common case; see
    parallel/scaling.py::projected_efficiency(overlap=True) for the
    model). Every per-cell op sequence is unchanged (the kernels are the
    same generalized _round_kernel on different windows), so results are
    BIT-identical to the non-overlap rounds — pinned by
    tests/test_parallel.py::test_sharded_overlap_matches_plain_rounds.

    Requires: my == 1, bx >= 3k (the frame windows need k inner rows
    below/above the frame), and a VMEM-resident (non-banded) shard.
    """
    gx, gy = params.grid_x, params.grid_y
    absorbing = params.boundary_type == BoundaryType.ABSORBING
    T = params.response_length
    n_chunks = k // chunk
    rounds = -(-T // k)
    T_pad = rounds * k
    mid = bx - 2 * k

    smem_t0 = pl.BlockSpec((1, 1), lambda c: (0, 0),
                           memory_space=pltpu.SMEM)
    smem_pulse = pl.BlockSpec((k, 1), lambda c: (0, 0),
                              memory_space=pltpu.SMEM)

    def make_round(rows):
        bxe = rows + 2 * k
        kernel = functools.partial(
            _round_kernel,
            courant=float(params.courant),
            thr=float(params.constants.audible_threshold_gain),
            src_dir_n=float(params.source_dir_samples),
            t_real=T, dry_n=params.dry_gain_samples,
            wet_n=params.wet_gain_samples,
            chunk=chunk, n_chunks=n_chunks, kx=k, ky=0, bx=rows, by=by)
        ext = pl.BlockSpec((bxe, by), lambda c: (0, 0),
                           memory_space=pltpu.VMEM)
        cell = pl.BlockSpec((rows, by), lambda c: (0, 0),
                            memory_space=pltpu.VMEM)
        cell_t = jax.ShapeDtypeStruct((rows, by), jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[smem_t0, smem_pulse,
                      ext, ext, ext, ext, ext, ext, ext, ext,
                      ext, ext, ext,
                      cell, cell, cell, cell, cell, cell],
            out_specs=[
                pl.BlockSpec((chunk, rows, by), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                cell, cell, cell, cell, cell, cell, cell, cell, cell,
            ],
            out_shape=[jax.ShapeDtypeStruct((k, rows, by), jnp.float32)]
            + [cell_t] * 9,
            scratch_shapes=[pltpu.VMEM((bxe, by), jnp.float32)] * 3,
            cost_estimate=pl.CostEstimate(
                flops=k * bxe * by * 44,
                bytes_accessed=k * rows * by * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )

    run_frame = make_round(k)      # top and bottom share one kernel
    run_int = make_round(mid)

    n_chunks_m = T_pad // chunk

    def make_moments(rows):
        kernel = functools.partial(
            _moments_kernel, chunk=chunk, t_real=T,
            dry_n=params.dry_gain_samples,
            schro_off=params.schroeder_offset_samples,
            npx=rows, npy=by, n_chunks=n_chunks_m)
        cell = pl.BlockSpec((rows, by), lambda c: (0, 0),
                            memory_space=pltpu.VMEM)
        cell_t = jax.ShapeDtypeStruct((rows, by), jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(n_chunks_m,),
            in_specs=[
                cell,
                pl.BlockSpec((chunk, rows, by),
                             lambda c: (n_chunks_m - 1 - c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[cell, cell],
            out_shape=[cell_t, cell_t],
            scratch_shapes=[pltpu.VMEM((rows, by), jnp.float32)],
            interpret=interpret,
        )

    mom_frame = make_moments(k)
    mom_int = make_moments(mid)

    def local_sim(beta, Y, pulse, lix, liy):
        px = jax.lax.axis_index("x")
        py = jax.lax.axis_index("y")          # always 0 (my == 1)

        beta_e = _exchange_axes(beta, k, 0)   # [bx + 2k, by]
        y_e = _exchange_axes(Y, k, 0)
        gi = (px * bx - k
              + jax.lax.broadcasted_iota(jnp.int32, (bx + 2 * k, by), 0))
        gj = (py * by
              + jax.lax.broadcasted_iota(jnp.int32, (bx + 2 * k, by), 1))
        zrow = jnp.zeros((1, by), jnp.float32)
        zcol = jnp.zeros((bx + 2 * k, 1), jnp.float32)
        b_xm = jnp.concatenate([zrow, beta_e[:-1]], axis=0)
        y_xm = jnp.concatenate([zrow, y_e[:-1]], axis=0)
        b_ym = jnp.concatenate([zcol, beta_e[:, :-1]], axis=1)
        y_ym = jnp.concatenate([zcol, y_e[:, :-1]], axis=1)
        coefs = stencil_coefficients(
            beta_e, y_e, b_xm, y_xm, b_ym, y_ym, gi, gj, gx, gy, absorbing)
        src_mask = ((gi == lix) & (gj == liy)).astype(jnp.float32)

        # static per-window slices of the folded planes (beta + 6 coefs +
        # src), in the kernel's input order
        def window(sl):
            return tuple(a[sl] for a in (beta_e,) + coefs + (src_mask,))

        args_top = window(slice(0, 3 * k))
        args_int = window(slice(k, k + bx))
        args_bot = window(slice(bx - k, bx + 2 * k))

        z = jnp.zeros((bx, by), jnp.float32)
        onset0 = jnp.full((bx, by), jnp.inf, jnp.float32)
        gz = jnp.zeros((k, by), jnp.float32)
        t0s = (jnp.arange(rounds, dtype=jnp.int32) * k).reshape(rounds, 1, 1)
        pulse_pad = jnp.zeros(T_pad, jnp.float32).at[:T].set(pulse)
        pulse_rounds = pulse_pad.reshape(rounds, k, 1)

        def one_round(carry, xt):
            (p, vx, vy, onset, fx, fy, ed, ew, et,
             gt_p, gt_vx, gt_vy, gb_p, gb_vx, gb_vy) = carry
            t0, pulse_k = xt

            # 1. frame kernels (consume last round's ghosts; round 0's
            # zero ghosts are exact — all state is zero at t=0)
            def topw(a, g):
                return jnp.concatenate([g, a[:2 * k]], axis=0)

            def botw(a, g):
                return jnp.concatenate([a[-2 * k:], g], axis=0)

            (rec_t, pt, vxt, vyt, ot, fxt, fyt, edt, ewt, ett) = run_frame(
                t0, pulse_k, *args_top,
                topw(p, gt_p), topw(vx, gt_vx), topw(vy, gt_vy),
                onset[:k], fx[:k], fy[:k], ed[:k], ew[:k], et[:k])
            (rec_b, pb, vxb, vyb, ob, fxb, fyb, edb, ewb, etb) = run_frame(
                t0, pulse_k, *args_bot,
                botw(p, gb_p), botw(vx, gb_vx), botw(vy, gb_vy),
                onset[-k:], fx[-k:], fy[-k:], ed[-k:], ew[-k:], et[-k:])

            # 2. next round's ghosts = neighbors' NEW frames; depends only
            # on the frame kernels, NOT on the interior kernel below — the
            # async-collective scheduler can run the permute while the
            # interior advances
            ngt_p = _from_prev(pb, "x")
            ngt_vx = _from_prev(vxb, "x")
            ngt_vy = _from_prev(vyb, "x")
            ngb_p = _from_next(pt, "x")
            ngb_vx = _from_next(vxt, "x")
            ngb_vy = _from_next(vyt, "x")

            # 3. interior kernel: round-start state only (the frames are
            # its doomed fringe)
            (rec_m, pm, vxm, vym, om, fxm, fym, edm, ewm, etm) = run_int(
                t0, pulse_k, *args_int, p, vx, vy,
                onset[k:-k], fx[k:-k], fy[k:-k],
                ed[k:-k], ew[k:-k], et[k:-k])

            def cat(a, b, c):
                return jnp.concatenate([a, b, c], axis=0)

            new_carry = (cat(pt, pm, pb), cat(vxt, vxm, vxb),
                         cat(vyt, vym, vyb), cat(ot, om, ob),
                         cat(fxt, fxm, fxb), cat(fyt, fym, fyb),
                         cat(edt, edm, edb), cat(ewt, ewm, ewb),
                         cat(ett, etm, etb),
                         ngt_p, ngt_vx, ngt_vy, ngb_p, ngb_vx, ngb_vy)
            return new_carry, (rec_t, rec_m, rec_b)

        carry0 = (z, z, z, onset0, z, z, z, z, z,
                  gz, gz, gz, gz, gz, gz)
        final, (recs_t, recs_m, recs_b) = jax.lax.scan(
            one_round, carry0, (t0s, pulse_rounds))
        (_, _, _, onset, fx, fy, ed, ew, et) = final[:9]
        rt = recs_t.reshape(T_pad, k, by)
        rm = recs_m.reshape(T_pad, mid, by)
        rb = recs_b.reshape(T_pad, k, by)
        if with_pressure:
            # the row concat is the (one) unavoidable copy here; slicing
            # it to [:T] folds into a smaller concat, so full_pressure
            # would only enlarge it — always publish the cropped form
            pressure = jnp.concatenate([rt, rm, rb], axis=1)[:T]
        else:
            pressure = jnp.zeros((0, bx, by), jnp.float32)
        if not with_moments:
            return pressure, onset, fx, fy
        s0t, s1t = mom_frame(onset[:k], rt)
        s0m, s1m = mom_int(onset[k:-k], rm)
        s0b, s1b = mom_frame(onset[-k:], rb)
        s0 = jnp.concatenate([s0t, s0m, s0b], axis=0)
        s1 = jnp.concatenate([s1t, s1m, s1b], axis=0)
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


def _overlap_banded_impl(params: GridParams, beta, refl, pulse,
                         listener_ix, listener_iy, mesh: Mesh,
                         bx: int, by: int, k: int,
                         band_rows: int | None, interpret: bool,
                         with_moments: bool, with_pressure: bool,
                         full_pressure: bool = False):
    """Overlap rounds for BEYOND-VMEM shards (r5): the boundary-first
    split of :func:`_overlap_impl` applied to the band-streamed HBM
    kernel, so the weak-scaling deployment shape (big per-chip worlds —
    BASELINE.md's 480x512+/1020^2 blocks) gets the hidden exchange too.

    Per round, three pieces with the same cone argument as the fused
    split:

      1. a 2-band FRAME launch (window [ghost k | frame k | inner k],
         3k rows each, stacked into one compact [6k, W] input) advances
         the k top / k bottom interior rows using last round's ghosts;
      2. the new frames' ppermute depends only on that launch;
      3. the INTERIOR launch bands over the remaining bx-2k rows from
         round-start state only — no ghosts in its windows at all (its
         outermost surviving row is k-deep, so its windows stop at the
         frame rows) — and therefore has no dependency on the permute.

    The generalized :func:`_banded_round_kernel` runs both launches
    (frames: win_stride=3k, out_stride=k, geo_stride=bx-k); every
    per-cell op sequence is unchanged, so results are BIT-identical to
    the plain banded rounds (pinned by
    tests/test_parallel.py::test_sharded_banded_overlap_matches_plain).
    Requires my == 1 and bx >= 3k, like the fused split; the banded DMA
    alignment rules (k % 8, band % 8 on TPU) apply unchanged.
    """
    gx, gy = params.grid_x, params.grid_y
    absorbing = params.boundary_type == BoundaryType.ABSORBING
    T = params.response_length
    rounds = -(-T // k)
    T_pad = rounds * k
    mid = bx - 2 * k

    bye_b = by + 2 * k            # symmetric y ghosts (zeros: my == 1)
    W = -(-bye_b // 128) * 128
    bb = _pick_shard_band(bx, W, k, band_rows)
    n_int = -(-mid // bb)
    rows_int = n_int * bb + 2 * k       # interior-launch input rows
    if not interpret:
        check_recording_elements(T_pad, n_int * bb + 2 * k, W,
                                 "banded overlap rounds (per shard)")
        if bb % 8 != 0 or k % 8 != 0:
            raise ValueError(
                f"banded rounds on TPU need band_rows % 8 == 0 and "
                f"halo % 8 == 0 (got band_rows={bb}, halo={k})")

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem_t0 = pl.BlockSpec((1, 1), lambda b: (0, 0),
                           memory_space=pltpu.SMEM)
    smem_pulse = pl.BlockSpec((k, 1), lambda b: (0, 0),
                              memory_space=pltpu.SMEM)
    smem_geo = pl.BlockSpec((1, 4), lambda b: (0, 0),
                            memory_space=pltpu.SMEM)

    common = dict(
        courant=float(params.courant),
        thr=float(params.constants.audible_threshold_gain),
        src_dir_n=float(params.source_dir_samples),
        t_real=T, dry_n=params.dry_gain_samples,
        wet_n=params.wet_gain_samples,
        k=k, w=W, gx=gx, gy=gy, absorbing=absorbing)

    def make_call(n_bands, rec_rows, out_rows, **strides):
        wide_t = jax.ShapeDtypeStruct((out_rows, W), jnp.float32)
        return pl.pallas_call(
            functools.partial(_banded_round_kernel, **common, **strides),
            grid=(n_bands,),
            in_specs=[smem_t0, smem_pulse, smem_geo] + [hbm] * 11,
            out_specs=[hbm] * 10,
            out_shape=[jax.ShapeDtypeStruct((k, rec_rows, W), jnp.float32)]
            + [wide_t] * 9,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )

    run_frames = make_call(2, 2 * k, 2 * k, bb=k, win_stride=3 * k,
                           out_stride=k, geo_stride=bx - k)
    run_int = make_call(n_int, n_int * bb, n_int * bb, bb=bb)

    def local_sim(beta, Y, pulse, lix, liy):
        px = jax.lax.axis_index("x")
        py = jax.lax.axis_index("y")          # always 0 (my == 1)

        beta_e = _exchange_halo(beta, k)      # [bx+2k, by+2k]
        y_e = _exchange_halo(Y, k)

        def widenc(a, rows):
            a = a[:rows]       # drop surplus rows (tight interior grids)
            return jnp.pad(a, ((0, rows - a.shape[0]),
                               (0, W - a.shape[1])))

        # static geometry per launch: frames see [ghost|2k top] stacked on
        # [2k bottom|ghost]; the interior sees interior rows + the bottom
        # ghost (its overshoot windows read past bx; pad rows are inert)
        beta_fr = widenc(jnp.concatenate(
            [beta_e[:3 * k], beta_e[-3 * k:]], axis=0), 6 * k)
        y_fr = widenc(jnp.concatenate(
            [y_e[:3 * k], y_e[-3 * k:]], axis=0), 6 * k)
        beta_int = widenc(beta_e[k:], rows_int)
        y_int = widenc(y_e[k:], rows_int)
        geo_fr = jnp.stack([px * bx - k, py * by - k,
                            lix, liy]).astype(jnp.int32).reshape(1, 4)
        geo_int = jnp.stack([px * bx, py * by - k,
                             lix, liy]).astype(jnp.int32).reshape(1, 4)

        z_state = jnp.zeros((bx, by), jnp.float32)
        z_acc = jnp.zeros((bx, W), jnp.float32)
        onset0 = jnp.full((bx, W), jnp.inf, jnp.float32)
        gz = jnp.zeros((k, W), jnp.float32)
        t0s = (jnp.arange(rounds, dtype=jnp.int32) * k).reshape(rounds, 1, 1)
        pulse_pad = jnp.zeros(T_pad, jnp.float32).at[:T].set(pulse)
        pulse_rounds = pulse_pad.reshape(rounds, k, 1)

        def colw(a):
            # state [*, by] -> wide cols [*, W]: [k ghost cols | by | pad],
            # all zero outside the interior (my == 1: no y neighbors)
            return jnp.pad(a, ((0, 0), (k, W - by - k)))

        def acc_int_rows(a):
            # accumulator rows seen by the interior launch: [k, k+n_int*bb)
            take = min(bx - k, n_int * bb)
            return jnp.pad(a[k:k + take], ((0, n_int * bb - take), (0, 0)))

        def one_round(carry, xt):
            (p, vx, vy, onset, fx, fy, ed, ew, et,
             gt_p, gt_vx, gt_vy, gb_p, gb_vx, gb_vy) = carry
            t0, pulse_k = xt

            # 1. frame launch (consumes last round's ghosts; round 0's
            # zero ghosts are exact — all state is zero at t=0)
            def fr_state(a, gt, gb):
                aw = colw(a)
                return jnp.concatenate(
                    [gt, aw[:2 * k], aw[-2 * k:], gb], axis=0)

            def fr_acc(a):
                return jnp.concatenate([a[:k], a[-k:]], axis=0)

            (rec_f, p_f, vx_f, vy_f, o_f, fx_f, fy_f,
             ed_f, ew_f, et_f) = run_frames(
                t0, pulse_k, geo_fr, beta_fr, y_fr,
                fr_state(p, gt_p, gb_p), fr_state(vx, gt_vx, gb_vx),
                fr_state(vy, gt_vy, gb_vy),
                fr_acc(onset), fr_acc(fx), fr_acc(fy),
                fr_acc(ed), fr_acc(ew), fr_acc(et))

            # 2. exchange the NEW frames (depends only on the frame
            # launch, so it can run under the interior launch below)
            ngt_p = _from_prev(p_f[k:], "x")
            ngt_vx = _from_prev(vx_f[k:], "x")
            ngt_vy = _from_prev(vy_f[k:], "x")
            ngb_p = _from_next(p_f[:k], "x")
            ngb_vx = _from_next(vx_f[:k], "x")
            ngb_vy = _from_next(vy_f[:k], "x")

            # 3. interior launch: round-start state only, no ghosts
            def int_state(a):
                return jnp.pad(colw(a), ((0, rows_int - bx), (0, 0)))

            (rec_m, p_m, vx_m, vy_m, o_m, fx_m, fy_m,
             ed_m, ew_m, et_m) = run_int(
                t0, pulse_k, geo_int, beta_int, y_int,
                int_state(p), int_state(vx), int_state(vy),
                acc_int_rows(onset), acc_int_rows(fx), acc_int_rows(fy),
                acc_int_rows(ed), acc_int_rows(ew), acc_int_rows(et))

            def asm(f, m):
                return jnp.concatenate([f[:k], m[:mid], f[k:]], axis=0)

            col = slice(k, k + by)
            new_carry = (asm(p_f, p_m)[:, col], asm(vx_f, vx_m)[:, col],
                         asm(vy_f, vy_m)[:, col],
                         asm(o_f, o_m), asm(fx_f, fx_m), asm(fy_f, fy_m),
                         asm(ed_f, ed_m), asm(ew_f, ew_m),
                         asm(et_f, et_m),
                         ngt_p, ngt_vx, ngt_vy, ngb_p, ngb_vx, ngb_vy)
            return new_carry, (rec_f, rec_m)

        carry0 = (z_state, z_state, z_state, onset0,
                  z_acc, z_acc, z_acc, z_acc, z_acc,
                  gz, gz, gz, gz, gz, gz)
        final, (recs_f, recs_m) = jax.lax.scan(
            one_round, carry0, (t0s, pulse_rounds))
        (_, _, _, onset, fx, fy, ed, ew, et) = final[:9]
        rf = recs_f.reshape(T_pad, 2 * k, W)
        rm = recs_m.reshape(T_pad, n_int * bb, W)
        col = slice(k, k + by)
        if with_pressure:
            # concat + column slice are the unavoidable copies here;
            # full_pressure would only enlarge them (see the plain banded
            # note in _simulate_impl) — always publish the cropped form
            pressure = jnp.concatenate(
                [rf[:, :k], rm[:, :mid], rf[:, k:]], axis=1)[:T, :, col]
        else:
            pressure = jnp.zeros((0, bx, by), jnp.float32)
        if not with_moments:
            return (pressure, onset[:, col], fx[:, col], fy[:, col])
        run_mom_f = pl.pallas_call(
            functools.partial(
                _tiled_moments_kernel, bx=2 * k, k=k, t_real=T,
                dry_n=params.dry_gain_samples,
                schro_off=params.schroeder_offset_samples,
                n_rounds=rounds),
            grid=(rounds, 1),
            in_specs=[hbm, hbm],
            out_specs=[hbm] * 3,
            out_shape=[jax.ShapeDtypeStruct((2 * k, W), jnp.float32)] * 3,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )
        run_mom_m = pl.pallas_call(
            functools.partial(
                _tiled_moments_kernel, bx=bb, k=k, t_real=T,
                dry_n=params.dry_gain_samples,
                schro_off=params.schroeder_offset_samples,
                n_rounds=rounds),
            grid=(rounds, n_int),
            in_specs=[hbm, hbm],
            out_specs=[hbm] * 3,
            out_shape=[jax.ShapeDtypeStruct((n_int * bb, W),
                                            jnp.float32)] * 3,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )
        onset_f = jnp.concatenate([onset[:k], onset[-k:]], axis=0)
        s0f, s1f, _ = run_mom_f(onset_f, rf)
        s0m, s1m, _ = run_mom_m(acc_int_rows(onset), rm)

        def asm2(f, m):
            return jnp.concatenate([f[:k], m[:mid], f[k:]], axis=0)

        s0 = asm2(s0f, s0m)
        s1 = asm2(s1f, s1m)
        return (pressure, onset[:, col], fx[:, col], fy[:, col],
                ed[:, col], ew[:, col], et[:, col], s0[:, col], s1[:, col])

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


def _delegate_tiled_1x1(params: GridParams, beta, refl, pulse,
                        listener_ix, listener_iy,
                        nx_pad: int, ny_pad: int, halo: int,
                        interpret: bool, with_moments: bool,
                        with_pressure: bool = True,
                        full_pressure: bool = False):
    """Exchange-free 1x1-mesh route of :func:`_simulate_impl`: the tiled
    kernel (one launch, HBM-resident state) with results SLICED to the
    sharded contract's [nx_pad, ny_pad] shapes. The tiled padding is a
    superset of the mesh padding (band multiples are multiples of 8, lane
    pad 128 >= the mesh's 8), and tiled pad cells carry exactly the values
    the beta=0 shard padding produces in the round kernels (silent: onset
    inf, everything else zero) — so a pure slice is bit-identical to the
    round-kernel outputs AND avoids re-materializing the multi-GB
    recording through a pad copy (the r5 first cut paid ~3 ms of
    crop+pad on the 459^2 row). ``with_pressure=False`` drops the [T,...]
    recording output entirely (moments-only callers)."""
    from planeverb_tpu.ops.fdtd_tiled import (_simulate_tiled_impl,
                                              _tiled_rt60_moments)

    nx, ny = params.nx, params.ny
    T = params.response_length
    rec, onset, fx, fy, ed, ew, et = _simulate_tiled_impl(
        params, beta[:nx, :ny], refl[:nx, :ny], pulse,
        listener_ix, listener_iy, halo=halo, interpret=interpret)
    assert onset.shape[0] >= nx_pad and onset.shape[1] >= ny_pad, \
        (onset.shape, nx_pad, ny_pad)

    def fit(a):
        return a[:nx_pad, :ny_pad]

    if with_pressure and full_pressure:
        # the slab buffer itself, [T_pad, npx_tiled, npy_tiled] (a spatial
        # superset of the contract shape, silent pads): no recording copy
        # at all — lazy-crop callers (the engine) index [:T, cx<nx, cy<ny]
        pressure = rec
    else:
        t_keep = T if with_pressure else 0
        pressure = rec[:t_keep, :nx_pad, :ny_pad]
    if not with_moments:
        return pressure, fit(onset), fit(fx), fit(fy)
    s0, s1 = _tiled_rt60_moments(params, onset, rec, None, halo, interpret)
    return (pressure, fit(onset), fit(fx), fit(fy),
            fit(ed), fit(ew), fit(et), fit(s0), fit(s1))


def _simulate_impl(params: GridParams, beta, refl, pulse,
                   listener_ix, listener_iy, mesh: Mesh,
                   nx_pad: int, ny_pad: int, halo: int,
                   chunk: int | None, interpret: bool,
                   with_moments: bool, band_rows: int | None = None,
                   overlap: bool = False, with_pressure: bool = True,
                   full_pressure: bool = False):
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
    # Per-axis ghost widths for the fused rounds (r5): an UNsharded mesh
    # axis has no neighbors, so it needs no ghosts — its window edge is
    # the global edge, handled by the kernel's zero-neighbor shifts
    # exactly as in the single-chip fused kernel. A 1D (N, 1) mesh stops
    # paying 2k ghost columns of compute per round, and a 1x1 mesh
    # measures the pure round structure (launch + state round-trip per k
    # steps), which is the quantity the projected-efficiency model
    # calibrates against. The banded path keeps symmetric ghosts (its
    # lane-padded DMA layout assumes them).
    kx = k if mx > 1 else 0
    ky = k if my > 1 else 0
    bxe, bye = bx + 2 * kx, by + 2 * ky

    # per-shard VMEM routing, mirroring the single-device simulate_auto:
    # fused VMEM-resident rounds when the shard fits, band-streamed rounds
    # (HBM state, fdtd_tiled-style) beyond that — so a Context(mesh=...) can
    # span grids whose shards exceed VMEM (the 100x-grid scaling target)
    banded = (band_rows is not None
              or sharded_kernel_vmem_bytes(bx, by, k, chunk, kx, ky)
              > _VMEM_BUDGET_BYTES)

    if overlap:
        if my != 1:
            raise ValueError(
                f"overlap=True needs a 1D ('x', N) mesh (y unsharded; "
                f"got {mx}x{my}) — the boundary-frame split exchanges "
                f"contiguous row slabs")
        if mx > 1:
            if bx < 3 * k:
                raise ValueError(
                    f"overlap=True needs shard rows >= 3*halo (frame + "
                    f"doomed fringe + frame), got bx={bx} < {3 * k}")
            if banded:
                # beyond-VMEM shards get the same boundary-first split on
                # the band-streamed kernel — the weak-scaling deployment
                # shape (big per-chip worlds) hides its exchange too
                return _overlap_banded_impl(
                    params, beta, refl, pulse, listener_ix, listener_iy,
                    mesh, bx, by, k, band_rows, interpret, with_moments,
                    with_pressure, full_pressure)
            return _overlap_impl(params, beta, refl, pulse,
                                 listener_ix, listener_iy, mesh,
                                 bx, by, k, chunk, interpret, with_moments,
                                 with_pressure, full_pressure)
        # mx == 1: a single shard exchanges nothing — the plain rounds
        # below are already communication-free

    if banded and mx == 1 and my == 1 and band_rows is None:
        # A 1-shard mesh needs no halo exchange at all — the round
        # structure exists only to refresh ghosts, so its per-round XLA
        # machinery (three full-state exchange concats, widen() re-pads,
        # state crops, one launch per k steps) is pure overhead here:
        # measured r4, 13.3 G for the banded rounds vs 20.3 G for the
        # single-device tiled kernel on the identical 459^2 workload
        # (VERDICT r4 weak #4). Take the named remedy to its limit — "run
        # multiple rounds per launch when the mesh axis is 1" — by routing
        # to the tiled kernel (ops/fdtd_tiled.py): same in-window
        # coefficient fold, same k-step band advance, ALL rounds in one
        # launch with HBM-resident double-buffered state, bit-comparable
        # to the banded rounds (pinned by the cross-solver parity tests).
        # The banded round kernel itself — the path real multi-shard
        # meshes take — remains reachable and parity-tested on 1x1 via an
        # explicit band_rows=...
        return _delegate_tiled_1x1(params, beta, refl, pulse,
                                   listener_ix, listener_iy,
                                   nx_pad, ny_pad, k, interpret,
                                   with_moments, with_pressure,
                                   full_pressure)

    cell_t = jax.ShapeDtypeStruct((bx, by), jnp.float32)

    if banded:
        # lane-pad the whole banded data path: Mosaic DMA slices must be
        # lane-aligned, so every DMA'd array spans W columns (the 128
        # multiple covering interior + 2k ghosts); local_sim crops columns
        # [k, k+by) after the rounds. The kernel folds stencil
        # coefficients IN-WINDOW from beta/Y + the shard origin (r4; like
        # fdtd_tiled) instead of streaming 8 precomputed planes per band
        # per round (the r3 design) — the round-invariant HBM reads drop
        # ~2x. Pads are zeroed at every round start and sit >= k+1 cells
        # from the interior, which is what preserves bit parity with the
        # fused round (see _banded_round_kernel docstring — in-round pad
        # activity is possible but cannot reach a surviving cell).
        bye_b = by + 2 * k          # banded ghosts stay symmetric
        W = -(-bye_b // 128) * 128
        bb = _pick_shard_band(bx, W, k, band_rows)
        # row-pad the interior to a band multiple (pad rows are appended
        # AFTER the bottom ghosts so the real ghosts stay stencil-adjacent
        # to the interior; zero coefficients keep them inert, and
        # local_sim crops rows [0, bx) afterwards) — frees the band height
        # from divisibility so big bands can amortize halo-row compute
        bxp = -(-bx // bb) * bb
        if not interpret:
            check_recording_elements(T_pad, bxp, W,
                                     "banded sharded rounds (per shard)")
        if not interpret and (bb % 8 != 0 or k % 8 != 0):
            # Mosaic DMA row slices must be sublane-aligned: the HBM reads
            # use offsets tb*bb and sizes bb/bb+2k, and the round-end writes
            # slice the VMEM window at row offset k (pw.at[pl.ds(k, bb)]) —
            # so both bb and k themselves must be multiples of 8. Fail
            # clearly at the API boundary rather than deep inside kernel
            # compilation.
            raise ValueError(
                f"banded rounds on TPU need band_rows % 8 == 0 and "
                f"halo % 8 == 0 (got band_rows={bb}, halo={k})")
        wide_t = jax.ShapeDtypeStruct((bxp, W), jnp.float32)
        # pin DMA'd operands to HBM explicitly: under ANY, Mosaic may
        # promote small buffers to VMEM, where dynamically-offset DMA
        # slices hit further tiling restrictions
        hbm = pl.BlockSpec(memory_space=pltpu.HBM)
        smem_t0 = pl.BlockSpec((1, 1), lambda b: (0, 0),
                               memory_space=pltpu.SMEM)
        smem_pulse = pl.BlockSpec((k, 1), lambda b: (0, 0),
                                  memory_space=pltpu.SMEM)
        smem_geo = pl.BlockSpec((1, 4), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)
        run_round = pl.pallas_call(
            functools.partial(
                _banded_round_kernel,
                courant=float(params.courant),
                thr=float(params.constants.audible_threshold_gain),
                src_dir_n=float(params.source_dir_samples),
                t_real=T, dry_n=params.dry_gain_samples,
                wet_n=params.wet_gain_samples,
                k=k, bb=bb, w=W, gx=gx, gy=gy, absorbing=absorbing),
            grid=(bxp // bb,),
            in_specs=[smem_t0, smem_pulse, smem_geo] + [hbm] * 11,
            out_specs=[hbm] * 10,
            out_shape=[jax.ShapeDtypeStruct((k, bxp, W), jnp.float32)]
            + [wide_t] * 9,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )
        run_moments_banded = pl.pallas_call(
            functools.partial(
                _tiled_moments_kernel, bx=bb, k=k, t_real=T,
                dry_n=params.dry_gain_samples,
                schro_off=params.schroeder_offset_samples,
                n_rounds=rounds),
            grid=(rounds, bxp // bb),
            in_specs=[hbm, hbm],
            out_specs=[hbm] * 3,
            out_shape=[wide_t, wide_t, wide_t],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )

        def run_moments(onset, recs):
            s0, s1, _edc = run_moments_banded(onset, recs)
            return s0, s1
    else:
        round_out_shape = [
            jax.ShapeDtypeStruct((k, bx, by), jnp.float32),
            cell_t, cell_t, cell_t,
            cell_t, cell_t, cell_t, cell_t, cell_t, cell_t,
        ]
        kernel = functools.partial(
            _round_kernel,
            courant=float(params.courant),
            thr=float(params.constants.audible_threshold_gain),
            src_dir_n=float(params.source_dir_samples),
            t_real=T, dry_n=params.dry_gain_samples,
            wet_n=params.wet_gain_samples,
            chunk=chunk, n_chunks=n_chunks, kx=kx, ky=ky, bx=bx, by=by)

        ext = pl.BlockSpec((bxe, bye), lambda c: (0, 0),
                           memory_space=pltpu.VMEM)
        cell = pl.BlockSpec((bx, by), lambda c: (0, 0),
                            memory_space=pltpu.VMEM)

        run_round = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((k, 1), lambda c: (0, 0),
                             memory_space=pltpu.SMEM),
                ext, ext, ext, ext, ext, ext, ext, ext,  # beta, 6 coefs, src
                ext, ext, ext,                           # p, vx, vy (ext)
                cell, cell, cell, cell, cell, cell,  # onset,fx,fy,ed,ew,et
            ],
            out_specs=[
                pl.BlockSpec((chunk, bx, by), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                cell, cell, cell,                        # p, vx, vy interior
                cell, cell, cell, cell, cell, cell,  # onset,fx,fy,ed,ew,et
            ],
            out_shape=round_out_shape,
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
                             lambda c: (n_chunks_m - 1 - c, 0, 0),  # reverse
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

        if banded:
            beta_e = _exchange_halo(beta, k)
            y_e = _exchange_halo(Y, k)
            # lane-pad everything the banded kernel DMAs to W columns and
            # row-pad the extended block to bxp + 2k rows (the pad rows go
            # AFTER the bottom ghosts, so ghosts stay stencil-adjacent to
            # the interior); accumulators run in window-column space
            # (interior = rows [0, bx), columns [k, k+by)). Coefficients
            # fold IN-WINDOW inside the kernel (from beta/Y + the shard
            # origin in geo); re-padding with zeros EVERY round is
            # load-bearing — see the kernel docstring's pad-cone argument.
            def widen(a):
                return jnp.pad(a, ((0, bxp - bx), (0, W - bye_b)))

            beta_e = widen(beta_e)
            y_e = widen(y_e)
            geo = jnp.stack([px * bx - k, py * by - k,
                             lix, liy]).astype(jnp.int32).reshape(1, 4)
            acc_rows, acc_w = bxp, W
        else:
            beta_e = _exchange_axes(beta, kx, ky)
            y_e = _exchange_axes(Y, kx, ky)
            # global coordinates of the extended block (wide-solver layout;
            # per-axis ghost offsets — 0 on unsharded axes)
            gi = (px * bx - kx
                  + jax.lax.broadcasted_iota(jnp.int32, (bxe, bye), 0))
            gj = (py * by - ky
                  + jax.lax.broadcasted_iota(jnp.int32, (bxe, bye), 1))
            zrow = jnp.zeros((1, bye), jnp.float32)
            zcol = jnp.zeros((bxe, 1), jnp.float32)
            b_xm = jnp.concatenate([zrow, beta_e[:-1]], axis=0)
            y_xm = jnp.concatenate([zrow, y_e[:-1]], axis=0)
            b_ym = jnp.concatenate([zcol, beta_e[:, :-1]], axis=1)
            y_ym = jnp.concatenate([zcol, y_e[:, :-1]], axis=1)
            # folded once per simulation; fringe-row shift artifacts are
            # discarded by the k-step halo argument
            # (parallel/solver.py:252-256)
            a_x, b_x, d_x, a_y, b_y, d_y = stencil_coefficients(
                beta_e, y_e, b_xm, y_xm, b_ym, y_ym, gi, gj, gx, gy,
                absorbing)
            src_mask = ((gi == lix) & (gj == liy)).astype(jnp.float32)
            acc_rows, acc_w = bx, by
        z_state = jnp.zeros((bx, by), jnp.float32)
        z_int = jnp.zeros((acc_rows, acc_w), jnp.float32)
        onset0 = jnp.full((acc_rows, acc_w), jnp.inf, jnp.float32)
        t0s = (jnp.arange(rounds, dtype=jnp.int32) * k).reshape(rounds, 1, 1)
        pulse_pad = jnp.zeros(T_pad, jnp.float32).at[:T].set(pulse)
        pulse_rounds = pulse_pad.reshape(rounds, k, 1)

        def one_round(carry, xt):
            p_i, vx_i, vy_i, onset, fx, fy, ed, ew, et = carry
            t0, pulse_k = xt
            if banded:
                p_e = _exchange_halo(p_i, k)
                vx_e = _exchange_halo(vx_i, k)
                vy_e = _exchange_halo(vy_i, k)
            else:
                p_e = _exchange_axes(p_i, kx, ky)
                vx_e = _exchange_axes(vx_i, kx, ky)
                vy_e = _exchange_axes(vy_i, kx, ky)
            if banded:
                p_e, vx_e, vy_e = widen(p_e), widen(vx_e), widen(vy_e)
                (rec, p2, vx2, vy2, onset2, fx2, fy2,
                 ed2, ew2, et2) = run_round(
                    t0, pulse_k, geo, beta_e, y_e,
                    p_e, vx_e, vy_e, onset, fx, fy, ed, ew, et)
            else:
                (rec, p2, vx2, vy2, onset2, fx2, fy2,
                 ed2, ew2, et2) = run_round(
                    t0, pulse_k, beta_e, a_x, b_x, d_x, a_y, b_y, d_y,
                    src_mask, p_e, vx_e, vy_e, onset, fx, fy, ed, ew, et)
            if banded:
                p2 = p2[:bx, k:k + by]
                vx2 = vx2[:bx, k:k + by]
                vy2 = vy2[:bx, k:k + by]
            return (p2, vx2, vy2, onset2, fx2, fy2, ed2, ew2, et2), rec

        carry0 = (z_state, z_state, z_state, onset0,
                  z_int, z_int, z_int, z_int, z_int)
        (_, _, _, onset, fx, fy, ed, ew, et), recs = jax.lax.scan(
            one_round, carry0, (t0s, pulse_rounds))
        recs = recs.reshape(T_pad, acc_rows, acc_w)
        if banded:
            rows, col = slice(None, bx), slice(k, k + by)
        else:
            rows = col = slice(None)
        # moments-only callers drop the [T, ...] recording output (the
        # slab stays internal); full_pressure keeps the padded rows so
        # the FUSED path's output is the identity (no recording copy —
        # crop at query time, see fdtd_pallas.simulate_moments_pallas).
        # The banded path's lane-pad column slice is non-identity either
        # way, so there full_pressure would only enlarge the unavoidable
        # copy — keep the [:T] crop (publish fewer rows).
        if not with_pressure:
            t_keep = 0
        elif banded or not full_pressure:
            t_keep = T
        else:
            t_keep = T_pad
        pressure = recs[:t_keep, rows, col]
        if not with_moments:
            return pressure, onset[rows, col], fx[rows, col], fy[rows, col]
        # backward RT60 regression pass, fully shard-local (the recording
        # never leaves the shard): suffix EDC + regression moments
        s0, s1 = run_moments(onset, recs)
        return (pressure, onset[rows, col], fx[rows, col], fy[rows, col],
                ed[rows, col], ew[rows, col], et[rows, col],
                s0[rows, col], s1[rows, col])

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
                              "chunk", "interpret", "band_rows", "overlap"))
def simulate_sharded_pallas(params: GridParams, beta, refl, pulse,
                            listener_ix, listener_iy, mesh: Mesh,
                            nx_pad: int, ny_pad: int, halo: int = 16,
                            chunk: int | None = None,
                            interpret: bool = False,
                            band_rows: int | None = None,
                            overlap: bool = False) -> FdtdResult:
    """Run one simulation pass sharded over ``mesh`` at fused-kernel rates.

    Same contract as :func:`planeverb_tpu.parallel.simulate_sharded`
    (padded [T, nx_pad, ny_pad] pressure + [nx_pad, ny_pad] onset/flux;
    crop to params.nx/ny for analysis). ``halo`` is the exchange period k;
    ``chunk`` (divides halo, default min(halo, 16)) is the recording
    writeback granularity inside each round's kernel.

    Shards whose round kernel would exceed the VMEM budget are routed
    automatically to the band-streamed round kernel (HBM state,
    :func:`_banded_round_kernel`) — the multi-chip engine spans grids of
    any size, like the single-device ``simulate_auto`` — and an
    exchange-free beyond-VMEM 1x1 mesh delegates to the tiled kernel
    outright (:func:`_delegate_tiled_1x1`). ``band_rows`` forces the
    banded path with an explicit band height (any positive value — the
    interior is row-padded to a band multiple — but on TPU it and
    ``halo`` must both be multiples of 8, for sublane-aligned DMA; see
    :func:`_pick_shard_band`).

    ``overlap=True`` (1D ("x", N) meshes with shard rows >= 3*halo)
    restructures each round boundary-first so the frame ppermute runs
    concurrently with the interior kernel — :func:`_overlap_impl` for
    VMEM-resident shards, :func:`_overlap_banded_impl` beyond — with
    results BIT-identical to the plain rounds (parity tests pin it).
    """
    pressure, onset, fx, fy = _simulate_impl(
        params, beta, refl, pulse, listener_ix, listener_iy, mesh,
        nx_pad, ny_pad, halo, chunk, interpret, with_moments=False,
        band_rows=band_rows, overlap=overlap)
    return FdtdResult(pressure=pressure, onset=onset, flux_x=fx, flux_y=fy)


@functools.partial(
    jax.jit, static_argnames=("params", "mesh", "nx_pad", "ny_pad", "halo",
                              "chunk", "interpret", "band_rows", "overlap",
                              "with_pressure", "full_pressure"))
def simulate_moments_sharded(params: GridParams, beta, refl, pulse,
                             listener_ix, listener_iy, mesh: Mesh,
                             nx_pad: int, ny_pad: int, halo: int = 16,
                             chunk: int | None = None,
                             interpret: bool = False,
                             band_rows: int | None = None,
                             overlap: bool = False,
                             with_pressure: bool = True,
                             full_pressure: bool = False):
    """Sharded sim + in-kernel analyzer moments (multi-chip analog of
    ops/fdtd_pallas.py::simulate_moments_pallas).

    Returns (FdtdResult, analyzer.Moments) with every grid padded to
    [nx_pad, ny_pad]; the windowed energies stream inside the round kernel
    and the RT60 regression moments come from one shard-local backward pass
    over each shard's recording — no cross-device analysis traffic.
    ``with_pressure=False`` returns a zero-length pressure axis instead of
    the [T, ...] recording: moments-only callers skip a full-recording
    copy at the jit boundary (multi-GB on beyond-VMEM grids; the engine's
    multi-listener sharded mode uses this — per-view recordings are
    dropped by design).
    """
    from planeverb_tpu.ops.analyzer import Moments

    pressure, onset, fx, fy, ed, ew, et, s0, s1 = _simulate_impl(
        params, beta, refl, pulse, listener_ix, listener_iy, mesh,
        nx_pad, ny_pad, halo, chunk, interpret, with_moments=True,
        band_rows=band_rows, overlap=overlap, with_pressure=with_pressure,
        full_pressure=full_pressure)
    res = FdtdResult(pressure=pressure, onset=onset, flux_x=fx, flux_y=fy)
    return res, Moments(e_dry=ed, e_wet=ew, e_total=et, s0=s0, s1=s1)


def pipeline_sharded(params: GridParams, beta, refl, pulse,
                     listener_ix, listener_iy, mesh: Mesh,
                     nx_pad: int, ny_pad: int, efree,
                     listener_x, listener_z, halo: int = 16,
                     chunk: int | None = None, interpret: bool = False,
                     compute_directions: bool = True,
                     band_rows: int | None = None,
                     overlap: bool = False,
                     with_pressure: bool = True,
                     full_pressure: bool = False):
    """Full multi-chip pass: sharded sim + in-kernel moments + parameter
    assembly. Returns (FdtdResult, AnalyzerResults) — the multi-chip analog
    of ops/fdtd_pallas.py::pipeline_auto; results are cropped to the
    analysis grid."""
    from planeverb_tpu.ops import analyzer

    res, moments = simulate_moments_sharded(
        params, beta, refl, pulse, listener_ix, listener_iy, mesh,
        nx_pad, ny_pad, halo=halo, chunk=chunk, interpret=interpret,
        band_rows=band_rows, overlap=overlap, with_pressure=with_pressure,
        full_pressure=full_pressure)
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
