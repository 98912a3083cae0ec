"""Band-tiled (beyond-VMEM) kernel parity in interpret mode.

Verified bit-exact against the scan solver on real TPU v5e at 459x459x1187;
these pin the same equivalence on CPU without a chip.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from planeverb_tpu.config import PlaneverbConfig, compute_grid_params
from planeverb_tpu.ops import analyzer, fdtd, fdtd_tiled, voxelize
from planeverb_tpu.scene import demo_scene

CFG = PlaneverbConfig(grid_size_x=10.0, grid_size_y=10.0, grid_resolution=275)


def _setup(T):
    p = compute_grid_params(CFG)
    p = dataclasses.replace(p, response_length=T)
    beta, refl = voxelize.voxelize_np(p, demo_scene("SmallRoom").boxes)
    pulse = oracle.gaussian_pulse(p)[:T]
    lix, liy = p.world_to_cell(5.0, 5.0)
    return p, beta, refl, pulse, lix, liy


@pytest.mark.parametrize("band,halo,T", [(16, 4, 70), (8, 3, 33), (24, 8, 64)])
def test_tiled_parity_vs_scan(band, halo, T):
    p, beta, refl, pulse, lix, liy = _setup(T)
    ref = fdtd.simulate(p, beta, refl, jnp.asarray(pulse), lix, liy)
    res, (ed, ew, et) = fdtd_tiled.simulate_tiled(
        p, jnp.asarray(beta), jnp.asarray(refl), jnp.asarray(pulse),
        jnp.int32(lix), jnp.int32(liy), band_rows=band, halo=halo,
        interpret=True)
    np.testing.assert_array_equal(
        np.asarray(res.pressure)[:, :p.nx, :p.ny], np.asarray(ref.pressure))
    np.testing.assert_array_equal(
        np.asarray(res.onset)[:p.nx, :p.ny], np.asarray(ref.onset))
    np.testing.assert_array_equal(
        np.asarray(res.flux_x)[:p.nx, :p.ny], np.asarray(ref.flux_x))


def test_tiled_moments_match_jnp():
    p, beta, refl, pulse, lix, liy = _setup(70)
    ref = fdtd.simulate(p, beta, refl, jnp.asarray(pulse), lix, liy)
    mref = analyzer.moments_from_pressure(p, ref.pressure, ref.onset)
    res, m = fdtd_tiled.simulate_moments_tiled(
        p, jnp.asarray(beta), jnp.asarray(refl), jnp.asarray(pulse),
        jnp.int32(lix), jnp.int32(liy), band_rows=16, halo=4, interpret=True)
    gx, gy = p.grid_x, p.grid_y
    for name in ("e_dry", "e_wet", "e_total", "s0", "s1"):
        a = np.asarray(getattr(m, name))[:gx, :gy]
        b = np.asarray(getattr(mref, name))
        scale = np.abs(b).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-5, name


def test_band_autosizing():
    # auto band sizing stays within the sublane alignment and grid bounds
    assert fdtd_tiled._pick_band(459, 512, 16, None) % 8 == 0
    assert fdtd_tiled._pick_band(459, 512, 16, None) <= 464
    assert fdtd_tiled._pick_band(29, 128, 4, None) <= 32
    assert fdtd_tiled._pick_band(1000, 128, 16, 100) == 104  # explicit, padded


def test_recording_buffer_limit_guard():
    """A single TPU buffer caps at 2^31-1 elements (verified on v5e: the
    2048x1024x1024 recording of a 133m@750Hz world crashes the compiler).
    The guard must turn that into actionable guidance before any compile."""
    import pytest

    from planeverb_tpu.config import PlaneverbConfig, compute_grid_params, \
        gaussian_pulse
    from planeverb_tpu.ops import voxelize
    from planeverb_tpu.ops.fdtd_pallas import check_recording_elements

    check_recording_elements(1200, 1024, 1024, "ok")     # 1.26e9: fine
    with pytest.raises(ValueError, match="single-buffer"):
        check_recording_elements(2048, 1024, 1024, "over")

    p = compute_grid_params(PlaneverbConfig(
        grid_size_x=133.3, grid_size_y=133.3, grid_resolution=750))
    beta, refl = voxelize.voxelize_np(p, [])
    pulse = gaussian_pulse(p)
    with pytest.raises(ValueError, match="mesh"):
        fdtd_tiled.simulate_moments_tiled(
            p, jnp.asarray(beta), jnp.asarray(refl), jnp.asarray(pulse),
            5, 5, interpret=True)
