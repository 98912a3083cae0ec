"""Six-parameter golden parity vs the oracle on EVERY bundled scene.

SURVEY.md §4 test plan item (3): golden-file tests on every bundled .pv
scene for the six output parameters within tolerance. test_analyzer.py pins
the tolerances on three constructed fixtures; this module sweeps the full
demo-scene inventory (reference *.pv + DemoFiles/*.pv analogs) at LOW
resolution, each scene on a grid sized to contain its geometry.
"""

import numpy as np
import pytest

import oracle
from planeverb_tpu.config import PlaneverbConfig, compute_grid_params
from planeverb_tpu.core.free_grid import calibrate_free_field
from planeverb_tpu.ops import analyzer, fdtd, voxelize
from planeverb_tpu.scene import demo_scene

# scene -> grid edge length (m) covering its boxes (listener at center)
SCENE_GRIDS = {
    "SmallRoom": 10.0,
    "BigRoom": 11.0,
    "DirectionTester": 10.0,
    "ExampleProject": 10.0,
    "SmallRoomScene": 13.0,
    "UnityReplicationTest": 20.0,
    "HugeRoom": 25.0,
    "Shoebox": 25.0,
    "SingleWall": 25.0,
    "MiddleWallScene": 25.0,
    "FloorPlanScene": 25.0,
}

_EFREE_CACHE: dict = {}


def _efree(p):
    key = (p.nx, p.ny, p.response_length)
    if key not in _EFREE_CACHE:
        _EFREE_CACHE[key] = calibrate_free_field(p)
    return _EFREE_CACHE[key]


@pytest.fixture(scope="module", params=sorted(SCENE_GRIDS))
def golden(request):
    name = request.param
    size = SCENE_GRIDS[name]
    cfg = PlaneverbConfig(grid_size_x=size, grid_size_y=size,
                          grid_resolution=275)
    scene = demo_scene(name)
    listener = (size / 2.0, size / 2.0)

    p = compute_grid_params(cfg)
    beta, refl = voxelize.voxelize_np(p, scene.boxes)
    pulse = oracle.gaussian_pulse(p)
    lx, ly = p.world_to_cell(*listener)
    res = fdtd.simulate(p, beta, refl, pulse, lx, ly)
    efree = _efree(p)
    out = analyzer.analyze(p, res.pressure, res.onset, res.flux_x,
                           res.flux_y, np.float32(efree),
                           np.float32(listener[0]), np.float32(listener[1]))

    grid = oracle.build_scene(cfg, scene)
    rec = oracle.generate_response(grid, *listener)
    ref = oracle.analyze(grid, *rec, *listener, efree)
    return name, p, out, ref


def _pair(p, out, ref, key):
    eng = np.asarray(getattr(out, key))
    o = ref[key]
    shape = ((p.grid_x, p.grid_y, 2) if eng.ndim == 3
             else (p.grid_x, p.grid_y))
    return eng, o.reshape(shape)


def test_delay(golden):
    name, p, out, ref = golden
    eng, o = _pair(p, out, ref, "delay_samples")
    np.testing.assert_array_equal(eng, o)


def test_occlusion(golden):
    name, p, out, ref = golden
    eng, o = _pair(p, out, ref, "occlusion")
    np.testing.assert_allclose(eng, o, rtol=2e-4, atol=1e-5)


def test_wet_gain(golden):
    name, p, out, ref = golden
    eng, o = _pair(p, out, ref, "wet_gain")
    np.testing.assert_allclose(eng, o, rtol=2e-4, atol=1e-5)


def test_lowpass(golden):
    name, p, out, ref = golden
    eng, o = _pair(p, out, ref, "lowpass")
    np.testing.assert_allclose(eng, o, rtol=2e-4, atol=1e-2)


def test_rt60(golden):
    name, p, out, ref = golden
    eng, o = _pair(p, out, ref, "rt60")
    valid = (o > 0.01) & (o < 100.0)
    np.testing.assert_allclose(eng[valid], o[valid], rtol=5e-3)
    # open scenes (e.g. a single wall with absorbing edges) legitimately
    # have no cell with a well-defined reverberant decay; enclosed ones must
    if name in ("SmallRoom", "BigRoom", "HugeRoom", "Shoebox"):
        assert valid.sum() > 0


def test_source_directivity(golden):
    name, p, out, ref = golden
    eng, o = _pair(p, out, ref, "source_directivity")
    np.testing.assert_allclose(eng, o, rtol=1e-3, atol=1e-4)


def test_direction(golden):
    name, p, out, ref = golden
    eng, o = _pair(p, out, ref, "direction")
    diff = np.abs(eng - o).max(axis=-1)
    frac_bad = float((diff > 1e-4).mean())
    assert frac_bad <= 0.01, (name, frac_bad)
