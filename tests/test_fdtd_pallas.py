"""Fused Pallas FDTD kernel parity (interpret mode on CPU).

The kernel is bit-exact vs the lax.scan solver on real TPU hardware
(verified on v5e); these tests pin the same equivalence in interpret mode so
CI catches semantic drift without a chip.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from planeverb_tpu.config import PlaneverbConfig, compute_grid_params
from planeverb_tpu.ops import fdtd, fdtd_pallas, voxelize
from planeverb_tpu.scene import demo_scene

CFG = PlaneverbConfig(grid_size_x=10.0, grid_size_y=10.0, grid_resolution=275)


def _run(scene, T, chunk=16, boundary=None):
    p = compute_grid_params(CFG if boundary is None else
                            dataclasses.replace(CFG, grid_boundary_type=boundary))
    p = dataclasses.replace(p, response_length=T)
    boxes = scene.boxes if scene else []
    beta, refl = voxelize.voxelize_np(p, boxes)
    pulse = oracle.gaussian_pulse(p)[:T]
    lix, liy = p.world_to_cell(5.0, 5.0)
    ref = fdtd.simulate(p, beta, refl, jnp.asarray(pulse), lix, liy)
    res = fdtd_pallas.simulate_pallas(
        p, jnp.asarray(beta), jnp.asarray(refl), jnp.asarray(pulse),
        jnp.int32(lix), jnp.int32(liy), interpret=True, chunk=chunk)
    return p, ref, res


@pytest.mark.parametrize("T,chunk", [(64, 16), (70, 16), (30, 8)])
def test_parity_vs_scan(T, chunk):
    p, ref, res = _run(demo_scene("SmallRoom"), T, chunk)
    np.testing.assert_array_equal(
        np.asarray(res.pressure)[:, :p.nx, :p.ny], np.asarray(ref.pressure))
    np.testing.assert_array_equal(
        np.asarray(res.onset)[:p.nx, :p.ny], np.asarray(ref.onset))
    np.testing.assert_array_equal(
        np.asarray(res.flux_x)[:p.nx, :p.ny], np.asarray(ref.flux_x))
    np.testing.assert_array_equal(
        np.asarray(res.flux_y)[:p.nx, :p.ny], np.asarray(ref.flux_y))


def test_padding_silent_and_cropped():
    p, ref, res = _run(None, 64)
    pr = np.asarray(res.pressure)
    assert pr.shape[0] == 64  # T padding cropped
    assert np.abs(pr[:, p.nx:, :]).max() == 0.0
    assert np.abs(pr[:, :, p.ny:]).max() == 0.0


def test_reflecting_boundary():
    from planeverb_tpu.config import BoundaryType
    p, ref, res = _run(demo_scene("SmallRoom"), 48, 16,
                       boundary=BoundaryType.REFLECTING)
    np.testing.assert_array_equal(
        np.asarray(res.pressure)[:, :p.nx, :p.ny], np.asarray(ref.pressure))


def test_simulate_auto_dispatches_scan_on_cpu():
    import jax

    assert jax.devices()[0].platform == "cpu"
    p = compute_grid_params(CFG)
    p = dataclasses.replace(p, response_length=16)
    beta, refl = voxelize.voxelize_np(p, [])
    pulse = oracle.gaussian_pulse(p)[:16]
    res = fdtd_pallas.simulate_auto(p, jnp.asarray(beta), jnp.asarray(refl),
                                    jnp.asarray(pulse), 5, 5)
    assert res.pressure.shape == (16, p.nx, p.ny)  # unpadded => scan path
