"""Pallas sweep kernels vs the jnp block-op reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sphinxsys_tpu.core.adaptation import SPHAdaptation
from sphinxsys_tpu.core.materials import WeaklyCompressibleFluid
from sphinxsys_tpu.neighbors import grid_from_bounds
from sphinxsys_tpu.neighbors.cell_blocks import build_block_map, to_blocks
from sphinxsys_tpu.ops import pallas_sweep as ps
from sphinxsys_tpu.physics import fluid_blocks as fbops
from sphinxsys_tpu.physics import riemann as rs


def setup(n=600, tile_c=64):
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
    dx = 0.04
    adaptation = SPHAdaptation(spacing=dx, dim=2)
    grid = grid_from_bounds((0, 0), (1, 1), adaptation.cutoff)
    c_max = 2 * tile_c * ((grid.ncells + 2 * tile_c - 1) // (2 * tile_c))
    bm = build_block_map(jnp.asarray(pos), jnp.int32(n), grid, cap=16, c_max=c_max)
    assert not bool(bm.overflow)
    eos = WeaklyCompressibleFluid(rho0=1.0, c0=10.0)
    p_field = rng.uniform(0, 1, n).astype(np.float32)
    rho_field = np.asarray(eos.density_from_pressure(jnp.asarray(p_field)))
    fb = {
        "Position": to_blocks(bm, jnp.asarray(pos), fill=1e9),
        "Velocity": to_blocks(bm, jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)),
        # Pressure/Density consistent through the EoS: the 1st-half block op
        # recomputes p = EoS(rho) internally
        "Pressure": to_blocks(bm, jnp.asarray(p_field)),
        "Density": to_blocks(bm, jnp.asarray(rho_field, jnp.float32), fill=1.0),
        "VolumetricMeasure": to_blocks(bm, jnp.full((n,), dx * dx, jnp.float32), fill=1.0),
        "Mass": to_blocks(bm, jnp.full((n,), dx * dx, jnp.float32), fill=1.0),
    }
    m = bm.slot_mask.reshape(bm.c_max, 16)
    fb["SlotMask"] = jnp.concatenate([m, jnp.zeros((1, 16), bool)], axis=0)
    return fb, bm, adaptation


def test_ac1_sweep_matches_reference():
    fb, bm, adaptation = setup()
    kernel = adaptation.kernel
    eos = WeaklyCompressibleFluid(rho0=1.0, c0=10.0)
    riemann = rs.acoustic_riemann(eos)

    packed = ps.pack_state_2d(fb["Position"], fb["Velocity"], fb["Pressure"],
                              fb["VolumetricMeasure"], fb["SlotMask"])
    force_k, rd_k = ps.ac1_inner_sweep(
        packed, bm.nbr_block, kernel_h=kernel.h,
        factor_w=kernel._factor_w(2),
        inv_rho0c0_ave=riemann.inv_rho0c0_ave, tile_c=64, interpret=True)

    # reference: jnp block op with dt=0 (pure interaction, no wall)
    ref = fbops.acoustic_step_1st_half_b(
        dict(fb, Force=jnp.zeros_like(fb["Velocity"]),
             ForcePrior=jnp.zeros_like(fb["Velocity"]),
             DensityChangeRate=jnp.zeros_like(fb["Pressure"])),
        bm.nbr_block, kernel, 2, eos, riemann, 0.0)
    c = bm.c_max
    vol = fb["VolumetricMeasure"][:c]
    force_ref = np.asarray(ref["Force"][:c]) / np.asarray(vol)[..., None]
    rd_ref = np.asarray(ref["DensityChangeRate"][:c]) / np.asarray(fb["Density"][:c])
    mask = np.asarray(fb["SlotMask"][:c])
    scale = np.abs(force_ref[mask]).max() + 1e-9
    np.testing.assert_allclose(np.asarray(force_k)[mask] / scale,
                               force_ref[mask] / scale, atol=2e-5)
    rscale = np.abs(rd_ref[mask]).max() + 1e-9
    np.testing.assert_allclose(np.asarray(rd_k)[mask] / rscale,
                               rd_ref[mask] / rscale, atol=2e-5)


def test_ac2_sweep_matches_reference():
    fb, bm, adaptation = setup()
    kernel = adaptation.kernel
    eos = WeaklyCompressibleFluid(rho0=1.0, c0=10.0)
    riemann = rs.acoustic_riemann(eos)

    packed = ps.pack_state_2d(fb["Position"], fb["Velocity"], fb["Pressure"],
                              fb["VolumetricMeasure"], fb["SlotMask"])
    dcr_k, pdiss_k = ps.ac2_inner_sweep(
        packed, bm.nbr_block, kernel_h=kernel.h,
        factor_w=kernel._factor_w(2),
        rho0c0_geo=riemann.rho0c0_geo_ave, inv_c0=riemann.inv_c0_ave,
        limiter_coeff=riemann.limiter_coeff, tile_c=64, interpret=True)

    ref = fbops.acoustic_step_2nd_half_b(
        dict(fb, Force=jnp.zeros_like(fb["Velocity"]),
             ForcePrior=jnp.zeros_like(fb["Velocity"]),
             DensityChangeRate=jnp.zeros_like(fb["Pressure"])),
        bm.nbr_block, kernel, 2, riemann, 0.0)
    c = bm.c_max
    mask = np.asarray(fb["SlotMask"][:c])
    dcr_ref = np.asarray(ref["DensityChangeRate"][:c]) / np.asarray(fb["Density"][:c])
    pdiss_ref = np.asarray(ref["Force"][:c]) / np.asarray(
        fb["VolumetricMeasure"][:c])[..., None]
    ds = np.abs(dcr_ref[mask]).max() + 1e-9
    np.testing.assert_allclose(np.asarray(dcr_k)[mask] / ds,
                               dcr_ref[mask] / ds, atol=2e-5)
    psn = np.abs(pdiss_ref[mask]).max() + 1e-9
    np.testing.assert_allclose(np.asarray(pdiss_k)[mask] / psn,
                               pdiss_ref[mask] / psn, atol=2e-5)
