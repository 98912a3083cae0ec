"""Sharded-solver tests on the 8-device virtual CPU mesh (SURVEY.md §4.4).

Golden check: the spatially sharded solver must reproduce the single-chip
solver's fields bit-for-bit-modulo-f32-reduction on every mesh shape,
including shapes that require padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from planeverb_tpu.config import PlaneverbConfig, compute_grid_params
from planeverb_tpu.ops import analyzer, fdtd, voxelize
from planeverb_tpu.parallel import grid_mesh, pad_to_mesh, simulate_sharded
from planeverb_tpu.parallel.mesh import factor_mesh
from planeverb_tpu.scene import demo_scene

CFG = PlaneverbConfig(grid_size_x=10.0, grid_size_y=10.0, grid_resolution=275)
LISTENER = (5.0, 5.0)


def _setup(scene):
    p = compute_grid_params(CFG)
    boxes = scene.boxes if scene else []
    beta, refl = voxelize.voxelize_np(p, boxes)
    pulse = oracle.gaussian_pulse(p)
    lix, liy = p.world_to_cell(*LISTENER)
    return p, beta, refl, pulse, lix, liy


def _pad(arr, nx_pad, ny_pad):
    out = np.zeros((nx_pad, ny_pad), np.float32)
    out[:arr.shape[0], :arr.shape[1]] = arr
    return out


def test_virtual_device_count():
    assert len(jax.devices()) == 8, \
        "conftest must provide 8 virtual CPU devices"


def test_factor_mesh():
    assert factor_mesh(8) == (2, 4)
    assert factor_mesh(4) == (2, 2)
    assert factor_mesh(16) == (4, 4)
    assert factor_mesh(7) == (1, 7)


@pytest.mark.parametrize("shape", [(1, 1), (1, 8), (2, 4), (8, 1)])
def test_sharded_matches_single_chip(shape):
    p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
    ref = fdtd.simulate(p, beta, refl, pulse, lix, liy)

    n = shape[0] * shape[1]
    mesh = grid_mesh(jax.devices()[:n], shape)
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    res = simulate_sharded(p, _pad(beta, nx_pad, ny_pad),
                           _pad(refl, nx_pad, ny_pad), pulse,
                           jnp.int32(lix), jnp.int32(liy), mesh,
                           nx_pad, ny_pad)

    np.testing.assert_allclose(
        np.asarray(res.pressure)[:, :p.nx, :p.ny],
        np.asarray(ref.pressure), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(res.onset)[:p.nx, :p.ny], np.asarray(ref.onset))
    np.testing.assert_allclose(
        np.asarray(res.flux_x)[:p.nx, :p.ny], np.asarray(ref.flux_x),
        atol=1e-6)


def test_padding_stays_silent():
    """Padded cells (beta=0) must never develop pressure or velocity."""
    p, beta, refl, pulse, lix, liy = _setup(None)
    mesh = grid_mesh(jax.devices(), (2, 4))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    assert (nx_pad, ny_pad) != (p.nx, p.ny)  # padding actually exercised
    res = simulate_sharded(p, _pad(beta, nx_pad, ny_pad),
                           _pad(refl, nx_pad, ny_pad), pulse,
                           jnp.int32(lix), jnp.int32(liy), mesh,
                           nx_pad, ny_pad)
    pr = np.asarray(res.pressure)
    assert np.abs(pr[:, p.nx:, :]).max() == 0.0
    assert np.abs(pr[:, :, p.ny:]).max() == 0.0


def test_end_to_end_sharded_analysis():
    """simulate_sharded -> analyzer.analyze equals the single-chip pipeline."""
    from planeverb_tpu.core.free_grid import calibrate_free_field

    p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
    efree = calibrate_free_field(p)

    ref = fdtd.simulate(p, beta, refl, pulse, lix, liy)
    out_ref = analyzer.analyze(p, ref.pressure, ref.onset, ref.flux_x,
                               ref.flux_y, np.float32(efree),
                               np.float32(LISTENER[0]), np.float32(LISTENER[1]))

    mesh = grid_mesh(jax.devices(), (2, 4))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    res = simulate_sharded(p, _pad(beta, nx_pad, ny_pad),
                           _pad(refl, nx_pad, ny_pad), pulse,
                           jnp.int32(lix), jnp.int32(liy), mesh,
                           nx_pad, ny_pad)
    out = analyzer.analyze(p, res.pressure[:, :p.nx, :p.ny],
                           res.onset[:p.nx, :p.ny],
                           res.flux_x[:p.nx, :p.ny],
                           res.flux_y[:p.nx, :p.ny], np.float32(efree),
                           np.float32(LISTENER[0]), np.float32(LISTENER[1]))

    np.testing.assert_allclose(np.asarray(out.occlusion),
                               np.asarray(out_ref.occlusion), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rt60),
                               np.asarray(out_ref.rt60), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.direction),
                               np.asarray(out_ref.direction), atol=1e-4)


@pytest.mark.parametrize("shape,halo", [((2, 4), 4), ((2, 4), 7), ((1, 8), 3)])
def test_wide_halo_matches_single_chip(shape, halo):
    """Multi-step halo widening: k-wide ghosts exchanged every k steps must
    reproduce the per-step-exchange solver exactly (incl. T % halo != 0)."""
    from planeverb_tpu.parallel.solver import simulate_sharded_wide

    p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
    ref = fdtd.simulate(p, beta, refl, pulse, lix, liy)

    n = shape[0] * shape[1]
    mesh = grid_mesh(jax.devices()[:n], shape)
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    res = simulate_sharded_wide(p, _pad(beta, nx_pad, ny_pad),
                                _pad(refl, nx_pad, ny_pad), pulse,
                                jnp.int32(lix), jnp.int32(liy), mesh,
                                nx_pad, ny_pad, halo=halo)
    np.testing.assert_allclose(
        np.asarray(res.pressure)[:, :p.nx, :p.ny],
        np.asarray(ref.pressure), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(res.onset)[:p.nx, :p.ny], np.asarray(ref.onset))
    np.testing.assert_allclose(
        np.asarray(res.flux_x)[:p.nx, :p.ny], np.asarray(ref.flux_x),
        atol=1e-6)


def test_wide_halo_rejects_oversized_halo():
    from planeverb_tpu.parallel.solver import simulate_sharded_wide

    p, beta, refl, pulse, lix, liy = _setup(None)
    mesh = grid_mesh(jax.devices(), (2, 4))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    with pytest.raises(ValueError, match="halo"):
        simulate_sharded_wide(p, _pad(beta, nx_pad, ny_pad),
                              _pad(refl, nx_pad, ny_pad), pulse,
                              jnp.int32(lix), jnp.int32(liy), mesh,
                              nx_pad, ny_pad, halo=50)


class _FakeDev:
    def __init__(self, pid, i):
        self.process_index = pid
        self.id = i

    def __repr__(self):
        return f"d{self.process_index}.{self.id}"


class TestMultihost:
    def test_layout_single_process_matches_factorization(self):
        from planeverb_tpu.parallel.multihost import layout_by_process

        arr = layout_by_process(jax.devices())
        assert arr.shape == factor_mesh(8)

    def test_layout_groups_process_rows_contiguously(self):
        from planeverb_tpu.parallel.multihost import layout_by_process

        # 4 hosts x 4 devices: y-neighbors must be same-process (ICI only)
        devs = [_FakeDev(p, i) for p in range(4) for i in range(4)]
        arr = layout_by_process(devs)
        assert arr.shape == (8, 2)
        for row in arr:
            assert len({d.process_index for d in row}) == 1
        # x rows grouped: process changes at most once between adjacent rows
        pids = [row[0].process_index for row in arr]
        assert pids == sorted(pids)

    def test_layout_rejects_dcn_crossing_y(self):
        from planeverb_tpu.parallel.multihost import layout_by_process

        devs = [_FakeDev(p, i) for p in range(2) for i in range(2)]
        with pytest.raises(ValueError, match="DCN"):
            layout_by_process(devs, shape=(1, 4))

    def test_layout_rejects_uneven_processes(self):
        from planeverb_tpu.parallel.multihost import layout_by_process

        devs = [_FakeDev(0, 0), _FakeDev(0, 1), _FakeDev(1, 2)]
        with pytest.raises(ValueError, match="uneven"):
            layout_by_process(devs)

    def test_multihost_mesh_runs_sharded_solver(self):
        from planeverb_tpu.parallel.multihost import multihost_grid_mesh

        mesh = multihost_grid_mesh()
        p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
        nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
        res = simulate_sharded(
            p, jnp.asarray(_pad(beta, nx_pad, ny_pad)),
            jnp.asarray(_pad(refl, nx_pad, ny_pad)),
            jnp.asarray(pulse), jnp.int32(lix), jnp.int32(liy),
            mesh, nx_pad, ny_pad)
        ref = fdtd.simulate(p, jnp.asarray(beta), jnp.asarray(refl),
                            jnp.asarray(pulse), jnp.int32(lix),
                            jnp.int32(liy))
        np.testing.assert_allclose(
            np.asarray(res.pressure)[:, :p.nx, :p.ny],
            np.asarray(ref.pressure), atol=1e-6)

    def test_init_distributed_single_process_noop(self):
        from planeverb_tpu.parallel.multihost import init_distributed

        init_distributed(num_processes=1)  # must not raise or init anything

    def test_scaling_harness_rows(self):
        from planeverb_tpu.parallel.scaling import measure_scaling

        cfg = PlaneverbConfig(grid_size_x=6.0, grid_size_y=6.0,
                              grid_resolution=275)
        p = compute_grid_params(cfg)
        beta, refl = voxelize.voxelize_np(p, [])
        pulse = oracle.gaussian_pulse(p)
        lix, liy = p.world_to_cell(3.0, 3.0)
        rows = measure_scaling(p, beta, refl, pulse, lix, liy,
                               device_counts=[1, 2], halo=4, reps=1)
        assert [r["devices"] for r in rows] == [1, 2]
        assert rows[0]["efficiency_vs_1"] == 1.0
        assert all(r["wall_s"] > 0 and r["cell_updates_per_s"] > 0
                   for r in rows)


@pytest.mark.parametrize("shape,halo,chunk", [
    ((2, 4), 8, None),   # 2D mesh, one kernel iteration per round
    ((8, 1), 4, 2),      # 1D x-sharding (the TPU-fast layout), sub-chunked
    ((2, 4), 7, 7),      # T % halo != 0 tail round
])
def test_sharded_pallas_matches_single_chip(shape, halo, chunk):
    """Fused-kernel rounds between halo exchanges (parallel/solver_pallas.py)
    must reproduce the single-chip solver exactly, like the scan-based
    sharded solvers do."""
    from planeverb_tpu.parallel.solver_pallas import simulate_sharded_pallas

    p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
    ref = fdtd.simulate(p, beta, refl, pulse, lix, liy)

    n = shape[0] * shape[1]
    mesh = grid_mesh(jax.devices()[:n], shape)
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    res = simulate_sharded_pallas(p, _pad(beta, nx_pad, ny_pad),
                                  _pad(refl, nx_pad, ny_pad), pulse,
                                  jnp.int32(lix), jnp.int32(liy), mesh,
                                  nx_pad, ny_pad, halo=halo, chunk=chunk,
                                  interpret=True)
    np.testing.assert_allclose(
        np.asarray(res.pressure)[:, :p.nx, :p.ny],
        np.asarray(ref.pressure), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(res.onset)[:p.nx, :p.ny], np.asarray(ref.onset))
    np.testing.assert_allclose(
        np.asarray(res.flux_x)[:p.nx, :p.ny], np.asarray(ref.flux_x),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.flux_y)[:p.nx, :p.ny], np.asarray(ref.flux_y),
        atol=1e-6)


@pytest.mark.parametrize("shape,halo,band", [
    ((2, 4), 8, 8),      # 2D mesh, multi-band shards
    ((8, 1), 4, 8),      # 1D x-sharding
])
def test_sharded_banded_matches_fused_rounds(shape, halo, band):
    """The beyond-VMEM band-streamed round kernel (HBM state, lane-padded
    width) must be BIT-identical to the fused VMEM-resident rounds: the pad
    columns carry zero stencil coefficients so they stay exactly zero, and
    interior cells see the same value stream (solver_pallas.py::
    _banded_round_kernel). Moments (windowed energies + RT60 regression via
    the band-streamed backward pass) must agree too."""
    from planeverb_tpu.parallel.solver_pallas import (
        simulate_moments_sharded, simulate_sharded_pallas)

    p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
    n = shape[0] * shape[1]
    mesh = grid_mesh(jax.devices()[:n], shape)
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh, multiple=8)
    args = (p, _pad(beta, nx_pad, ny_pad), _pad(refl, nx_pad, ny_pad),
            pulse, jnp.int32(lix), jnp.int32(liy), mesh, nx_pad, ny_pad)

    fused = simulate_sharded_pallas(*args, halo=halo, interpret=True)
    banded = simulate_sharded_pallas(*args, halo=halo, interpret=True,
                                     band_rows=band)
    np.testing.assert_array_equal(np.asarray(banded.pressure),
                                  np.asarray(fused.pressure))
    np.testing.assert_array_equal(np.asarray(banded.onset),
                                  np.asarray(fused.onset))
    np.testing.assert_array_equal(np.asarray(banded.flux_x),
                                  np.asarray(fused.flux_x))
    np.testing.assert_array_equal(np.asarray(banded.flux_y),
                                  np.asarray(fused.flux_y))

    _, mf = simulate_moments_sharded(*args, halo=halo, interpret=True)
    _, mb = simulate_moments_sharded(*args, halo=halo, interpret=True,
                                     band_rows=band)
    for name in ("e_dry", "e_wet", "e_total", "s0", "s1"):
        np.testing.assert_allclose(
            np.asarray(getattr(mb, name)), np.asarray(getattr(mf, name)),
            atol=1e-5, rtol=1e-6, err_msg=name)


@pytest.mark.parametrize("shape,halo", [((8, 1), 4), ((4, 1), 8)])
def test_sharded_overlap_matches_plain_rounds(shape, halo):
    """The overlap rounds (boundary-frame kernels -> ppermute of the new
    frames OVERLAPPED with the interior kernel — solver_pallas._overlap_impl)
    must be BIT-identical to the plain sequential rounds: the same
    generalized _round_kernel runs the same per-cell op sequence, just on
    boundary/interior windows instead of one extended block."""
    from planeverb_tpu.parallel.solver_pallas import (
        simulate_moments_sharded, simulate_sharded_pallas)

    # 25 m grid: shards on the (8,1) mesh must satisfy bx >= 3*halo
    p = compute_grid_params(PlaneverbConfig(
        grid_size_x=25.0, grid_size_y=25.0, grid_resolution=275))
    beta, refl = voxelize.voxelize_np(p, demo_scene("SmallRoom").boxes)
    pulse = oracle.gaussian_pulse(p)
    lix, liy = p.world_to_cell(12.5, 12.5)
    n = shape[0] * shape[1]
    mesh = grid_mesh(jax.devices()[:n], shape)
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh, multiple=8)
    assert nx_pad // shape[0] >= 3 * halo
    args = (p, _pad(beta, nx_pad, ny_pad), _pad(refl, nx_pad, ny_pad),
            pulse, jnp.int32(lix), jnp.int32(liy), mesh, nx_pad, ny_pad)

    plain = simulate_sharded_pallas(*args, halo=halo, interpret=True)
    over = simulate_sharded_pallas(*args, halo=halo, interpret=True,
                                   overlap=True)
    for name in ("pressure", "onset", "flux_x", "flux_y"):
        np.testing.assert_array_equal(
            np.asarray(getattr(over, name)),
            np.asarray(getattr(plain, name)), err_msg=name)

    _, mp = simulate_moments_sharded(*args, halo=halo, interpret=True)
    _, mo = simulate_moments_sharded(*args, halo=halo, interpret=True,
                                     overlap=True)
    for name in ("e_dry", "e_wet", "e_total", "s0", "s1"):
        np.testing.assert_array_equal(
            np.asarray(getattr(mo, name)),
            np.asarray(getattr(mp, name)), err_msg=name)


@pytest.mark.parametrize("shape,halo,band", [((8, 1), 4, 8), ((4, 1), 8, 8)])
def test_sharded_banded_overlap_matches_plain(shape, halo, band):
    """The banded OVERLAP rounds (solver_pallas._overlap_banded_impl:
    2-band frame launch -> frame ppermute concurrent with the interior
    band launch) must be BIT-identical to the plain banded rounds — same
    generalized kernel, same per-cell op sequence, different windows.
    This is the beyond-VMEM weak-scaling shape's hidden-exchange path."""
    from planeverb_tpu.parallel.solver_pallas import (
        simulate_moments_sharded, simulate_sharded_pallas)

    p = compute_grid_params(PlaneverbConfig(
        grid_size_x=25.0, grid_size_y=25.0, grid_resolution=275))
    beta, refl = voxelize.voxelize_np(p, demo_scene("SmallRoom").boxes)
    pulse = oracle.gaussian_pulse(p)
    lix, liy = p.world_to_cell(12.5, 12.5)
    n = shape[0] * shape[1]
    mesh = grid_mesh(jax.devices()[:n], shape)
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh, multiple=8)
    assert nx_pad // shape[0] >= 3 * halo
    args = (p, _pad(beta, nx_pad, ny_pad), _pad(refl, nx_pad, ny_pad),
            pulse, jnp.int32(lix), jnp.int32(liy), mesh, nx_pad, ny_pad)

    plain = simulate_sharded_pallas(*args, halo=halo, interpret=True,
                                    band_rows=band)
    over = simulate_sharded_pallas(*args, halo=halo, interpret=True,
                                   band_rows=band, overlap=True)
    for name in ("pressure", "onset", "flux_x", "flux_y"):
        np.testing.assert_array_equal(
            np.asarray(getattr(over, name)),
            np.asarray(getattr(plain, name)), err_msg=name)

    _, mp = simulate_moments_sharded(*args, halo=halo, interpret=True,
                                     band_rows=band)
    _, mo = simulate_moments_sharded(*args, halo=halo, interpret=True,
                                     band_rows=band, overlap=True)
    for name in ("e_dry", "e_wet", "e_total", "s0", "s1"):
        np.testing.assert_array_equal(
            np.asarray(getattr(mo, name)),
            np.asarray(getattr(mp, name)), err_msg=name)


def test_noninterpret_paths_trace_cleanly():
    """The `if not interpret:` guard blocks (recording-element checks, DMA
    alignment) only execute on real-TPU traces, which the CPU parity
    tests never reach — an unimported name there ships a path that is
    dead on arrival on hardware (r5 code review caught exactly that in
    the banded-overlap guard). jax.eval_shape traces the full
    non-interpret path abstractly (no Mosaic compile), so any trace-time
    error surfaces here for every sharded routing variant."""
    import functools

    from planeverb_tpu.parallel.solver_pallas import simulate_sharded_pallas

    p = compute_grid_params(PlaneverbConfig(
        grid_size_x=25.0, grid_size_y=25.0, grid_resolution=275))
    mesh = grid_mesh(jax.devices()[:4], (4, 1))   # bx=24 >= 3*halo
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh, multiple=8)
    lix, liy = p.world_to_cell(12.5, 12.5)
    field = jax.ShapeDtypeStruct((nx_pad, ny_pad), jnp.float32)
    pulse = jax.ShapeDtypeStruct((p.response_length,), jnp.float32)

    def trace(**kw):
        fn = functools.partial(
            simulate_sharded_pallas, p,
            listener_ix=jnp.int32(lix), listener_iy=jnp.int32(liy),
            mesh=mesh, nx_pad=nx_pad, ny_pad=ny_pad,
            halo=8, interpret=False, **kw)
        out = jax.eval_shape(lambda b, r, pu: fn(b, r, pu),
                             field, field, pulse)
        assert out.onset.shape == (nx_pad, ny_pad)

    trace()                                  # fused rounds
    trace(overlap=True)                      # fused overlap split
    trace(band_rows=8)                       # banded rounds
    trace(band_rows=8, overlap=True)         # banded overlap split

    # 1x1 beyond-VMEM delegation (tiled kernel) — eval_shape on a 1x1 mesh
    mesh1 = grid_mesh(jax.devices()[:1], (1, 1))
    nx1, ny1 = pad_to_mesh(p.nx, p.ny, mesh1, multiple=8)
    f1 = jax.ShapeDtypeStruct((nx1, ny1), jnp.float32)
    import planeverb_tpu.parallel.solver_pallas as sp
    orig = sp._VMEM_BUDGET_BYTES
    try:
        sp._VMEM_BUDGET_BYTES = 0            # force the delegated route
        sp.simulate_sharded_pallas.clear_cache()
        out = jax.eval_shape(
            lambda b, r, pu: simulate_sharded_pallas(
                p, b, r, pu, jnp.int32(lix), jnp.int32(liy), mesh1,
                nx1, ny1, halo=8, interpret=False),
            f1, f1, pulse)
        assert out.onset.shape == (nx1, ny1)
    finally:
        sp._VMEM_BUDGET_BYTES = orig
        sp.simulate_sharded_pallas.clear_cache()


def test_sharded_overlap_rejects_bad_meshes():
    from planeverb_tpu.parallel.solver_pallas import simulate_sharded_pallas

    p, beta, refl, pulse, lix, liy = _setup(None)
    mesh = grid_mesh(jax.devices(), (2, 4))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh, multiple=8)
    with pytest.raises(ValueError, match="1D"):
        simulate_sharded_pallas(
            p, _pad(beta, nx_pad, ny_pad), _pad(refl, nx_pad, ny_pad),
            pulse, jnp.int32(lix), jnp.int32(liy), mesh, nx_pad, ny_pad,
            halo=4, interpret=True, overlap=True)
    mesh1 = grid_mesh(jax.devices(), (8, 1))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh1, multiple=8)
    bx = nx_pad // 8
    with pytest.raises(ValueError, match="3\\*halo"):
        simulate_sharded_pallas(
            p, _pad(beta, nx_pad, ny_pad), _pad(refl, nx_pad, ny_pad),
            pulse, jnp.int32(lix), jnp.int32(liy), mesh1, nx_pad, ny_pad,
            halo=bx, interpret=True, overlap=True)


def test_sharded_1x1_beyond_vmem_delegates_to_tiled(monkeypatch):
    """A 1-shard mesh needs no halo exchange, so beyond-VMEM 1x1 routing
    goes straight to the tiled kernel (one launch, HBM-resident state)
    instead of paying the per-round XLA machinery — r5 remedy for the
    r4 banded-vs-tiled 35% gap (VERDICT weak #4). Results must stay
    BIT-identical to the fused rounds, including the pad regions (silent
    beta=0 semantics: onset inf, zeros elsewhere)."""
    from planeverb_tpu.parallel import solver_pallas as sp

    p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
    mesh = grid_mesh(jax.devices()[:1], (1, 1))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh, multiple=8)
    args = (p, _pad(beta, nx_pad, ny_pad), _pad(refl, nx_pad, ny_pad),
            pulse, jnp.int32(lix), jnp.int32(liy), mesh, nx_pad, ny_pad)

    fused = sp.simulate_sharded_pallas(*args, halo=8, interpret=True)
    _, mf = sp.simulate_moments_sharded(*args, halo=8, interpret=True)
    try:
        sp.simulate_sharded_pallas.clear_cache()
        sp.simulate_moments_sharded.clear_cache()
        # shrink the budget so this small grid takes the beyond-VMEM route
        monkeypatch.setattr(sp, "_VMEM_BUDGET_BYTES", 0)
        deleg = sp.simulate_sharded_pallas(*args, halo=8, interpret=True)
        _, md = sp.simulate_moments_sharded(*args, halo=8, interpret=True)
    finally:
        # evict traces compiled under the shrunken budget: the jit cache
        # keys on arguments only, not on the routing constant
        sp.simulate_sharded_pallas.clear_cache()
        sp.simulate_moments_sharded.clear_cache()

    for name in ("pressure", "onset", "flux_x", "flux_y"):
        np.testing.assert_array_equal(
            np.asarray(getattr(deleg, name)),
            np.asarray(getattr(fused, name)), err_msg=name)
    for name in ("e_dry", "e_wet", "e_total", "s0", "s1"):
        np.testing.assert_array_equal(
            np.asarray(getattr(md, name)),
            np.asarray(getattr(mf, name)), err_msg=name)


def test_shard_band_pick_and_vmem_routing():
    """Auto band heights are sublane-aligned and VMEM-bounded (the interior
    is row-padded to a band multiple, so divisibility is free); oversized
    shards auto-route to the banded kernel — the guard that lets
    Context(mesh=...) span grids whose shards exceed VMEM."""
    from planeverb_tpu.ops.fdtd_pallas import _VMEM_BUDGET_BYTES
    from planeverb_tpu.parallel.solver_pallas import (
        _pick_shard_band, sharded_kernel_vmem_bytes)

    assert _pick_shard_band(64, 256, 16, 8) == 8        # explicit
    with pytest.raises(ValueError, match="positive"):
        _pick_shard_band(64, 256, 16, 0)
    bb = _pick_shard_band(464, 512, 16, None)           # auto: 8-aligned,
    assert bb % 8 == 0 and bb >= 8                      # VMEM-bounded, and
    assert ((bb + 32) * 20 + 30 * bb) * 512 * 4 <= 7 << 20  # capped at the
    assert bb <= 48                                     # measured sweet spot
    assert _pick_shard_band(16, 512, 16, None) == 16    # small shard: 1 band
    # the headline 192x192 shard fits VMEM; a 459x459 shard does not
    assert sharded_kernel_vmem_bytes(192, 192, 16, 16) <= _VMEM_BUDGET_BYTES
    assert sharded_kernel_vmem_bytes(464, 464, 16, 16) > _VMEM_BUDGET_BYTES


def test_sharded_pallas_rejects_bad_args():
    from planeverb_tpu.parallel.solver_pallas import simulate_sharded_pallas

    p, beta, refl, pulse, lix, liy = _setup(None)
    mesh = grid_mesh(jax.devices(), (2, 4))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    with pytest.raises(ValueError, match="halo"):
        simulate_sharded_pallas(p, _pad(beta, nx_pad, ny_pad),
                                _pad(refl, nx_pad, ny_pad), pulse,
                                jnp.int32(lix), jnp.int32(liy), mesh,
                                nx_pad, ny_pad, halo=50, interpret=True)
    with pytest.raises(ValueError, match="chunk"):
        simulate_sharded_pallas(p, _pad(beta, nx_pad, ny_pad),
                                _pad(refl, nx_pad, ny_pad), pulse,
                                jnp.int32(lix), jnp.int32(liy), mesh,
                                nx_pad, ny_pad, halo=8, chunk=3,
                                interpret=True)
    # compiled (non-interpret) banded rounds need sublane-aligned bands;
    # the check fires at the API boundary, before any Mosaic involvement
    with pytest.raises(ValueError, match="band_rows % 8"):
        simulate_sharded_pallas(p, _pad(beta, nx_pad, ny_pad),
                                _pad(refl, nx_pad, ny_pad), pulse,
                                jnp.int32(lix), jnp.int32(liy), mesh,
                                nx_pad, ny_pad, halo=8, interpret=False,
                                band_rows=3)


def test_multihost_two_processes_end_to_end():
    """Real multi-process bring-up: two OS processes join a jax.distributed
    runtime (2 virtual CPU devices each), build multihost_grid_mesh, and run
    simulate_sharded_wide on global arrays — parity asserted against a
    single-device solve inside each worker (tests/multihost_worker.py)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(sys.path[:2])  # tests + repo root
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for proc in procs:
            proc.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for proc, out in zip(procs, outs):
        assert proc.returncode == 0, out
    assert any("RESULT pid=0" in out for out in outs)


def test_sharded_moments_match_single_chip_kernel():
    """In-kernel moments under sharding must equal the fused single-chip
    kernel's moments exactly (windowed energies + backward RT60 pass,
    shard-local)."""
    from planeverb_tpu.ops.fdtd_pallas import simulate_moments_pallas
    from planeverb_tpu.parallel.solver_pallas import simulate_moments_sharded

    p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
    _, ref_mom = simulate_moments_pallas(
        p, jnp.asarray(beta), jnp.asarray(refl), jnp.asarray(pulse),
        lix, liy, interpret=True)

    mesh = grid_mesh(jax.devices(), (2, 4))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    res, mom = simulate_moments_sharded(
        p, _pad(beta, nx_pad, ny_pad), _pad(refl, nx_pad, ny_pad), pulse,
        jnp.int32(lix), jnp.int32(liy), mesh, nx_pad, ny_pad, halo=8,
        interpret=True)
    for name in ("e_dry", "e_wet", "e_total", "s0", "s1"):
        np.testing.assert_allclose(
            np.asarray(getattr(mom, name))[:p.nx, :p.ny],
            np.asarray(getattr(ref_mom, name))[:p.nx, :p.ny],
            atol=1e-6, rtol=1e-6, err_msg=name)


def test_pipeline_sharded_matches_single_chip():
    """Full multi-chip pipeline (sharded sim + in-kernel moments +
    assembly) against the single-chip pipeline on all six parameters."""
    from planeverb_tpu.core.free_grid import calibrate_free_field
    from planeverb_tpu.ops.fdtd_pallas import pipeline_auto
    from planeverb_tpu.parallel.solver_pallas import pipeline_sharded

    p, beta, refl, pulse, lix, liy = _setup(demo_scene("SmallRoom"))
    efree = calibrate_free_field(p)
    _, out_ref = pipeline_auto(
        p, jnp.asarray(beta), jnp.asarray(refl), jnp.asarray(pulse),
        lix, liy, jnp.float32(efree), jnp.float32(LISTENER[0]),
        jnp.float32(LISTENER[1]))

    mesh = grid_mesh(jax.devices(), (2, 4))
    nx_pad, ny_pad = pad_to_mesh(p.nx, p.ny, mesh)
    _, out = pipeline_sharded(
        p, _pad(beta, nx_pad, ny_pad), _pad(refl, nx_pad, ny_pad), pulse,
        jnp.int32(lix), jnp.int32(liy), mesh, nx_pad, ny_pad,
        jnp.float32(efree), jnp.float32(LISTENER[0]),
        jnp.float32(LISTENER[1]), halo=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out.occlusion),
                               np.asarray(out_ref.occlusion), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.wet_gain),
                               np.asarray(out_ref.wet_gain), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rt60),
                               np.asarray(out_ref.rt60), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.lowpass),
                               np.asarray(out_ref.lowpass), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.direction),
                               np.asarray(out_ref.direction), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.source_directivity),
                               np.asarray(out_ref.source_directivity),
                               atol=1e-4)


def test_scaling_harness_pallas_backend():
    from planeverb_tpu.parallel.scaling import measure_scaling

    cfg = PlaneverbConfig(grid_size_x=6.0, grid_size_y=6.0,
                          grid_resolution=275)
    p = compute_grid_params(cfg)
    beta, refl = voxelize.voxelize_np(p, [])
    pulse = oracle.gaussian_pulse(p)
    lix, liy = p.world_to_cell(3.0, 3.0)
    rows = measure_scaling(p, beta, refl, pulse, lix, liy,
                           device_counts=[2], halo=4, reps=1, chain=2,
                           solver="pallas")
    assert rows[0]["solver"] == "pallas" and rows[0]["wall_s"] > 0
    with pytest.raises(ValueError, match="solver"):
        measure_scaling(p, beta, refl, pulse, lix, liy, device_counts=[1],
                        solver="nope")
    # overlap sweep: 1D (n, 1) factorizations, halo clamped to bx >= 3k
    orows = measure_scaling(p, beta, refl, pulse, lix, liy,
                            device_counts=[2], halo=4, reps=1, chain=2,
                            solver="pallas", overlap=True)
    assert orows[0]["overlap"] and orows[0]["mesh"] == [2, 1]
    assert orows[0]["halo"] * 3 <= 24  # bx for the (2,1) mesh
    with pytest.raises(ValueError, match="pallas"):
        measure_scaling(p, beta, refl, pulse, lix, liy, device_counts=[1],
                        solver="wide", overlap=True)


def test_projected_efficiency_model():
    """The projected-scaling model (parallel/scaling.py::projected_efficiency)
    must reproduce its BASELINE.md tables: honest r5 calibration (the
    round kernel's device-scan rate), monotone decay with N for strong
    scaling, DCN charged on host-crossing axes only — and the north-star
    >= 80% at >= 2 hosts on the 100x workload achieved by the WEAK layout
    with overlap (BASELINE.md 'Projected scaling', recalibrated r5)."""
    from planeverb_tpu.parallel.scaling import (ROUND_RATE_CUPS,
                                                projected_efficiency,
                                                projected_weak_efficiency)

    # r05 two-parameter calibration (bench round_structure fits, cells
    # counted with the kernel's lane padding as the model counts them):
    # the round kernel's asymptotic rate; the fixed 2.4 us/round overhead
    # is the model default (scaling.ROUND_OVERHEAD_S)
    rate = ROUND_RATE_CUPS
    rows = projected_efficiency(1920, 1920, [1, 8, 16, 64], rate)
    by_n = {r["devices"]: r for r in rows}
    assert by_n[1]["efficiency"] == 1.0
    assert by_n[16]["hosts"] == 2
    # strong-scaling a FIXED 100x grid is ghost-compute + round-overhead
    # bound past 2 hosts (BASELINE r5 revoked r4's 84.5% strong headline
    # honestly; the two-parameter fit puts 2 hosts at ~0.69)
    assert 0.60 <= by_n[16]["efficiency"] < 0.80
    # single-host rows pay no DCN latency: comm stays in single-digit us
    assert by_n[8]["t_comm_round_us"] < 10.0
    # efficiency decays with N
    effs = [by_n[n]["efficiency"] for n in (1, 8, 16, 64)]
    assert effs == sorted(effs, reverse=True)
    # r5 per-axis ghosts: the 1-device row charges no ghost compute
    assert by_n[1]["mesh"] == [1, 1]

    # the north-star >= 80% at >= 2 hosts on the 100x workload: the WEAK
    # layout (480x512-cell shards on 16 chips ~= 100x the headline's
    # cells) with the overlap split — comm fully hidden, flat through 8
    # hosts (BASELINE.md weak table; 0.864 under the two-parameter fit —
    # plain rounds read 0.796 at this block, so overlap clears the bar)
    weak = projected_weak_efficiency(480, 512, [16, 32, 64], rate,
                                     overlap=True)
    for r in weak:
        assert r["hosts"] >= 2
        assert r["efficiency"] >= 0.85, r
        assert r["comm_hidden"] and r["t_comm_round_us"] == 0.0
    assert weak[0]["global_grid"] == [16 * 480, 512]
    assert 16 * 480 * 512 >= 100 * 192 * 192


def test_projected_efficiency_overlap_model():
    """overlap=True mirrors the implementation: only 1D ('x', N) meshes
    (plus the trivial 1x1) are searched, the exchange disappears from the
    round whenever it is shorter than the interior kernel, and the row
    carries the split's derivation fields."""
    from planeverb_tpu.parallel.scaling import (ROUND_RATE_CUPS,
                                                projected_efficiency)

    rate = ROUND_RATE_CUPS   # r05 two-parameter calibration
    rows = projected_efficiency(1920, 1920, [8, 16], rate, overlap=True)
    for r in rows:
        assert r["mesh"][1] == 1, r              # 1D x-meshes only
        assert "t_frame_round_us" in r and "comm_hidden" in r
        if r["comm_hidden"]:
            assert r["t_comm_round_us"] == 0.0   # hidden under interior
            assert (r["t_exchange_round_us"]
                    <= r["t_interior_round_us"])


def test_projected_weak_efficiency_model():
    """Weak scaling (fixed per-chip block, world grows with N): per-chip
    work is constant, so efficiency must stay FLAT once the mesh shape
    stabilizes — the regime BASELINE.md names as the actual deployment
    shape. With overlap, multi-host rows hide their exchange entirely for
    production-size blocks."""
    from planeverb_tpu.parallel.scaling import (ROUND_RATE_CUPS,
                                                projected_weak_efficiency)

    rate = ROUND_RATE_CUPS   # r05 two-parameter calibration
    rows = projected_weak_efficiency(1020, 1020, [1, 16, 32, 64], rate,
                                     overlap=True)
    by_n = {r["devices"]: r for r in rows}
    assert by_n[1]["efficiency"] == 1.0
    # the north-star regime: >= 80% at any host count, flat across N
    for n in (16, 32, 64):
        assert by_n[n]["efficiency"] >= 0.80, by_n[n]
        assert by_n[n]["hosts"] >= 2
    assert (by_n[64]["efficiency"]
            == pytest.approx(by_n[32]["efficiency"], abs=0.02))
    # global grid really grows with the mesh
    gx, gy = by_n[64]["global_grid"]
    assert gx * gy == 64 * 1020 * 1020


def test_measure_scaling_weak_mode():
    """measure_scaling(mode='weak') grows the world with the device count,
    holding the per-chip block and T fixed (plumbing check on the CPU
    mesh; real numbers come from the projected model)."""
    from planeverb_tpu.parallel.scaling import measure_scaling

    cfg = PlaneverbConfig(grid_size_x=6.0, grid_size_y=6.0,
                          grid_resolution=275)
    p = compute_grid_params(cfg)
    beta, refl = voxelize.voxelize_np(p, [])
    pulse = oracle.gaussian_pulse(p)
    lix, liy = p.world_to_cell(3.0, 3.0)
    rows = measure_scaling(p, beta, refl, pulse, lix, liy,
                           device_counts=[1, 4], halo=2, reps=1, chain=2,
                           solver="wide", mode="weak")
    assert rows[0]["mode"] == "weak"
    assert rows[0]["grid"] == [p.nx, p.ny]
    g1 = rows[1]["grid"]
    m1 = rows[1]["mesh"]
    # the grid grew with the mesh (per-chip block ~ the base grid)
    assert g1[0] >= p.nx * m1[0] - 2 and g1[1] >= p.ny * m1[1] - 2
    assert rows[1]["efficiency_vs_1"] > 0
    with pytest.raises(ValueError, match="mode"):
        measure_scaling(p, beta, refl, pulse, lix, liy, device_counts=[1],
                        mode="nope")
