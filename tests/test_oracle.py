"""Physical sanity checks on the NumPy oracle itself.

The oracle is the ground-truth fixture for the JAX engine; these tests pin its
behavior to physics (propagation speed, energy decay, free-field calibration)
so a bug in the oracle can't silently validate a buggy engine.
"""

import numpy as np
import pytest

import oracle
from planeverb_tpu.config import CONSTANTS, PlaneverbConfig
from planeverb_tpu.scene import demo_scene


@pytest.fixture(scope="module")
def small_cfg():
    return PlaneverbConfig(grid_size_x=10.0, grid_size_y=10.0,
                           grid_resolution=275)


@pytest.fixture(scope="module")
def empty_run(small_cfg):
    grid = oracle.build_scene(small_cfg, None)
    # listener at center
    p = grid.params
    lx = (p.grid_x // 2) * p.dx
    ly = (p.grid_y // 2) * p.dx
    rec = oracle.generate_response(grid, lx, ly)
    return grid, rec, (lx, ly)


def test_wave_propagates_at_c(empty_run):
    """Onset delay difference between two probes matches c (dx/dt = 1.5c)."""
    grid, (pr, _, _), (lx, ly) = empty_run
    p = grid.params
    cx, cy = p.grid_x // 2, p.grid_y // 2

    def onset_at(d_cells):
        idx = (cx + d_cells) * p.ny + cy
        sig = np.abs(pr[:, idx])
        return int(np.argmax(sig > CONSTANTS.audible_threshold_gain))

    # dx per cell, dt per sample, courant = c*dt/dx = 2/3
    # => 1.5 samples per cell of travel
    d_onset = onset_at(12) - onset_at(4)
    assert abs(d_onset - 1.5 * 8) < 4, d_onset


def test_energy_attenuates_with_distance(empty_run):
    grid, (pr, _, _), _ = empty_run
    p = grid.params
    cx, cy = p.grid_x // 2, p.grid_y // 2
    e = []
    for d in (4, 8, 12):
        idx = (cx + d) * p.ny + cy
        e.append(float(np.sum(pr[:, idx] ** 2)))
    assert e[0] > e[1] > e[2]


def test_free_field_energy_positive(small_cfg):
    efree = oracle.free_field_energy(small_cfg)
    assert efree > 0.0
    # EFreePerR: 1/r falloff
    assert (oracle.efree_per_r(efree, 0.35, 0, 0, 10, 0)
            > oracle.efree_per_r(efree, 0.35, 0, 0, 20, 0))


def test_wall_blocks_energy(small_cfg):
    """A reflective wall between listener and probe reduces dry energy."""
    p = oracle.compute_grid_params(small_cfg)
    lx = (p.grid_x // 2) * p.dx
    ly = (p.grid_y // 2) * p.dx

    free = oracle.build_scene(small_cfg, None)
    pr_f, _, _ = oracle.generate_response(free, lx, ly)

    walled = oracle.build_scene(small_cfg, demo_scene("MiddleWallScene"))
    # MiddleWallScene wall is at x=12.5 of a 25m scene; for the 10m grid build
    # a local wall instead
    walled = oracle.make_grid(small_cfg)
    oracle.add_aabb(walled, 6.5, 5.0, 0.75, 6.0, 0.98)
    pr_w, _, _ = oracle.generate_response(walled, lx, ly)

    probe = (p.grid_x - 3) * p.ny + (p.grid_y // 2)
    n_dry = int(0.03 * p.fs)
    e_free = float(np.sum(pr_f[:n_dry, probe] ** 2))
    e_wall = float(np.sum(pr_w[:n_dry, probe] ** 2))
    assert e_wall < 0.5 * e_free, (e_wall, e_free)


def test_analyzer_room_rt60_behavior(small_cfg):
    """SmallRoom (reflective walls): interior cells get positive RT60 and
    occlusion near 1 for unobstructed line of sight."""
    grid = oracle.build_scene(small_cfg, demo_scene("SmallRoom"))
    p = grid.params
    lx, ly = 5.0, 5.0
    rec = oracle.generate_response(grid, lx, ly)
    efree = oracle.free_field_energy(small_cfg)
    res = oracle.analyze(grid, *rec, lx, ly, efree)

    # cell near the listener, inside the room
    cx, cy = p.world_to_cell(5.5, 5.0)
    i = cx * p.grid_x + cy
    assert res["occlusion"][i] > 0.3
    assert res["rt60"][i] > 0.0
    assert res["wet_gain"][i] > 0.0
    assert 20.0 < res["lowpass"][i] <= 20000.0
    # direction should point from emitter cell toward listener (negative x)
    d = res["direction"][i]
    assert abs(np.linalg.norm(d) - 1.0) < 1e-4
