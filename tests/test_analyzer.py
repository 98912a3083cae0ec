"""Analyzer + DOA parity vs the oracle on known-answer scenes."""

import numpy as np
import pytest

import oracle
from planeverb_tpu.config import PlaneverbConfig, compute_grid_params
from planeverb_tpu.core.free_grid import calibrate_free_field
from planeverb_tpu.ops import analyzer, fdtd, voxelize
from planeverb_tpu.scene import demo_scene

CFG = PlaneverbConfig(grid_size_x=10.0, grid_size_y=10.0, grid_resolution=275)
LISTENER = (5.0, 5.0)


def run_engine(cfg, scene, listener):
    p = compute_grid_params(cfg)
    boxes = scene.boxes if scene else []
    beta, refl = voxelize.voxelize_np(p, boxes)
    pulse = oracle.gaussian_pulse(p)
    lx, ly = p.world_to_cell(*listener)
    res = fdtd.simulate(p, beta, refl, pulse, lx, ly)
    efree = calibrate_free_field(p)
    out = analyzer.analyze(p, res.pressure, res.onset, res.flux_x, res.flux_y,
                           np.float32(efree),
                           np.float32(listener[0]), np.float32(listener[1]))
    return p, out, efree


def run_oracle(cfg, scene, listener, efree):
    grid = oracle.build_scene(cfg, scene)
    rec = oracle.generate_response(grid, *listener)
    return oracle.analyze(grid, *rec, *listener, efree)


@pytest.fixture(scope="module", params=["SmallRoom", "MiddleWallScene_local",
                                        "empty"])
def pair(request):
    name = request.param
    if name == "SmallRoom":
        scene = demo_scene("SmallRoom")
    elif name == "empty":
        scene = None
    else:
        # a local single-wall diffraction scene that fits the 10 m grid
        from planeverb_tpu.scene import AABB, Scene
        scene = Scene(boxes=[AABB(6.5, 5.0, 0.75, 6.0, 0.98)], name=name)
    p, out, efree = run_engine(CFG, scene, LISTENER)
    ref = run_oracle(CFG, scene, LISTENER, efree)
    return name, p, out, ref


def _grids(p, out, ref, key):
    eng = np.asarray(getattr(out, key))
    if key == "direction":
        o = ref["direction"].reshape(p.grid_x, p.grid_y, 2)
    elif key == "source_directivity":
        o = ref["source_directivity"].reshape(p.grid_x, p.grid_y, 2)
    else:
        refkey = {"wet_gain": "wet_gain", "occlusion": "occlusion",
                  "rt60": "rt60", "lowpass": "lowpass",
                  "delay_samples": "delay_samples"}[key]
        o = ref[refkey].reshape(p.grid_x, p.grid_y)
    return eng, o


def test_efree_matches_oracle():
    p = compute_grid_params(CFG)
    efree = calibrate_free_field(p)
    o_efree = oracle.free_field_energy(CFG)
    assert abs(efree - o_efree) <= 1e-5 * abs(o_efree)


def test_delay_parity(pair):
    name, p, out, ref = pair
    eng, o = _grids(p, out, ref, "delay_samples")
    np.testing.assert_array_equal(eng, o)


def test_occlusion_parity(pair):
    name, p, out, ref = pair
    eng, o = _grids(p, out, ref, "occlusion")
    np.testing.assert_allclose(eng, o, rtol=2e-4, atol=1e-5)


def test_wet_gain_parity(pair):
    name, p, out, ref = pair
    eng, o = _grids(p, out, ref, "wet_gain")
    np.testing.assert_allclose(eng, o, rtol=2e-4, atol=1e-5)


def test_lowpass_parity(pair):
    name, p, out, ref = pair
    eng, o = _grids(p, out, ref, "lowpass")
    np.testing.assert_allclose(eng, o, rtol=2e-4, atol=1e-2)


def test_rt60_parity(pair):
    name, p, out, ref = pair
    eng, o = _grids(p, out, ref, "rt60")
    # RT60 = -60/slope is sensitive where the decay is flat; compare slopes
    # implicitly by comparing rt60 where the oracle's value is well-defined
    valid = (o > 0.01) & (o < 100.0)
    np.testing.assert_allclose(eng[valid], o[valid], rtol=5e-3)
    assert valid.sum() > 0 or name == "empty"


def test_source_directivity_parity(pair):
    name, p, out, ref = pair
    eng, o = _grids(p, out, ref, "source_directivity")
    np.testing.assert_allclose(eng, o, rtol=1e-3, atol=1e-4)


def test_direction_parity(pair):
    name, p, out, ref = pair
    eng, o = _grids(p, out, ref, "direction")
    # the walk is discrete; allow a tiny fraction of cells to settle on a
    # different-but-adjacent terminal cell due to f32 tie sensitivity
    diff = np.abs(eng - o).max(axis=-1)
    frac_bad = float((diff > 1e-4).mean())
    assert frac_bad <= 0.01, frac_bad


def test_lazy_walk_matches_pointer_jumping(pair):
    """Per-query host walk == full-grid device DOA on every cell."""
    from planeverb_tpu.ops.doa import walk_direction

    name, p, out, ref = pair
    occl = np.asarray(out.occlusion)
    delay = np.asarray(out.delay_samples)
    full = np.asarray(out.direction)
    mismatches = 0
    for i in range(0, p.grid_x, 2):
        for j in range(0, p.grid_y, 2):
            dx, dy = walk_direction(p, occl, delay, i, j,
                                    np.float32(LISTENER[0]),
                                    np.float32(LISTENER[1]))
            if abs(dx - full[i, j, 0]) > 1e-4 or abs(dy - full[i, j, 1]) > 1e-4:
                mismatches += 1
    total = ((p.grid_x + 1) // 2) * ((p.grid_y + 1) // 2)
    # identical semantics; allow only float-tie stragglers
    assert mismatches / total <= 0.01, (name, mismatches, total)


@pytest.mark.parametrize("rt60_true", [0.3, 0.9, 2.5])
def test_rt60_estimator_recovers_synthetic_decay(rt60_true):
    """SchroederEnvelope.sci analog (reference F1): a synthetic signal whose
    Schroeder EDC is exactly -60/rt60 dB/s must come back out of the
    backward integration + closed-form regression. Constructing p so that
    EDC(t) = exp(-2*lambda*t) exactly (per-sample energy = EDC differences,
    with the infinite tail's energy folded into the last sample) isolates
    the estimator from finite-record truncation bias, which is a property
    of short records, not of the estimator."""
    import jax.numpy as jnp

    p = compute_grid_params(CFG)
    T, fs = p.response_length, p.fs
    lam = 6.91 / (rt60_true * fs)          # amplitude decay rate per sample
    t = np.arange(T, dtype=np.float64)
    edc = np.exp(-2.0 * lam * t)
    energy = np.empty(T)
    energy[:-1] = edc[:-1] - edc[1:]
    energy[-1] = edc[-1]
    amp = np.sqrt(energy).astype(np.float32)

    pressure = np.zeros((T, p.nx, p.ny), np.float32)
    pressure[:, 5, 5] = amp
    onset = np.full((p.nx, p.ny), np.inf, np.float32)
    onset[5, 5] = 0.0
    zeros = np.zeros((p.nx, p.ny), np.float32)

    moments = analyzer.moments_from_pressure(p, jnp.asarray(pressure),
                                             jnp.asarray(onset))
    out = analyzer.analyze_moments(p, moments, jnp.asarray(onset),
                                   jnp.asarray(zeros), jnp.asarray(zeros),
                                   np.float32(1.0), np.float32(5.0),
                                   np.float32(5.0), compute_directions=False)
    got = float(np.asarray(out.rt60)[5, 5])
    assert abs(got - rt60_true) <= 0.02 * rt60_true, (got, rt60_true)


def test_free_field_fixed_domain_matches_full_grid():
    """Grids larger than CAL_SIZE_M calibrate on the fixed small domain
    (core/free_grid.py): the dry window closes before any boundary echo, so
    the value must match the reference's full-grid calibration, and the
    cache key must collapse across grid sizes (no full-grid init sims at
    100x-grid scale)."""
    from planeverb_tpu.core import free_grid

    def listener_class(p):
        # which cell the reference's float listener round-trip lands on
        # (FreeGrid.cpp:84; see _cal_params docstring — per-size EFree
        # values split into rounding classes ~2% apart)
        lx, ly = p.grid_x // 2, p.grid_y // 2
        wx = float(np.float32(lx) * np.float32(p.dx))
        wy = float(np.float32(ly) * np.float32(p.dx))
        cix, ciy = p.world_to_cell(wx, wy)
        return (cix - lx, ciy - ly)

    p30 = compute_grid_params(PlaneverbConfig(
        grid_size_x=30.0, grid_size_y=30.0, grid_resolution=275))
    full = free_grid._efree_on(p30)                  # legacy full-grid value
    cal = free_grid._cal_params(p30)
    assert (cal.grid_size_x, cal.grid_size_y) == (free_grid.CAL_SIZE_M,) * 2
    fixed = free_grid._efree_on(cal)
    # exact-ish when the 30 m full grid rounds its listener the same way as
    # the fixed domain; otherwise bounded by the known class spread
    rel = 1e-5 if listener_class(p30) == listener_class(cal) else 0.03
    assert fixed == pytest.approx(full, rel=rel)

    # cache hit across grid sizes (incl. non-square)
    free_grid.clear_cache()
    a = free_grid.calibrate_free_field(p30)
    p_big = compute_grid_params(PlaneverbConfig(
        grid_size_x=40.0, grid_size_y=55.0, grid_resolution=275))
    b = free_grid.calibrate_free_field(p_big)
    assert a == b
    assert len(free_grid._CACHE) == 1

    # every reference-expressible world (<= 25 m — its sandbox/demo range)
    # keeps the exact full-grid calibration: r4's 14 m fixed domain shifted
    # EFree for 14-25 m worlds (ADVICE r4), r5 restores them
    p25 = compute_grid_params(PlaneverbConfig(
        grid_size_x=25.0, grid_size_y=25.0, grid_resolution=275))
    assert free_grid._cal_params(p25) is p25

    # small grids keep the reference's exact full-grid behavior
    p10 = compute_grid_params(CFG)
    assert free_grid._cal_params(p10) is p10

    # elongated grids clamp only the long dimension (short-dim wall physics
    # preserved), so a 10x200 m world does NOT pay a full-length init sim
    p_long = compute_grid_params(PlaneverbConfig(
        grid_size_x=10.0, grid_size_y=200.0, grid_resolution=275))
    cal_long = free_grid._cal_params(p_long)
    assert (cal_long.grid_size_x, cal_long.grid_size_y) == (
        10.0, free_grid.CAL_SIZE_M)
    # Per-size EFree values fall into two classes ~2% apart: the
    # reference's float listener round-trip (FreeGrid.cpp:84) sometimes
    # floors the listener cell, putting the 1 m probe diagonally off-axis
    # (see _cal_params docstring). The clamped domain matches same-class
    # full grids exactly-ish and stays within the quirk spread of the rest.
    e_cal = free_grid._efree_on(cal_long)
    for long_m in (30.0, 40.0):
        p_full = compute_grid_params(PlaneverbConfig(
            grid_size_x=10.0, grid_size_y=long_m, grid_resolution=275))
        rel = (1e-5 if listener_class(p_full) == listener_class(cal_long)
               else 0.03)
        assert e_cal == pytest.approx(free_grid._efree_on(p_full), rel=rel)
