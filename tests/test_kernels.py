"""Smoothing-kernel unit tests (counterpart of the reference's
tests/unit_tests_src kernel tests, e.g. test_kernel_cubic_B_spline.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sphinxsys_tpu.core import kernels as K

KERNELS = [K.WendlandC2, K.CubicBSpline, K.Quadratic]


@pytest.mark.parametrize("kernel_cls", KERNELS)
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_unity_partition(kernel_cls, dim):
    """integral of W over R^dim == 1 (the reference Quadratic kernel is
    only normalized in 3D; we keep its factors for parity)."""
    if kernel_cls is K.Quadratic and dim != 3:
        pytest.skip("reference Quadratic kernel is only normalized in 3D")
    h = 0.7
    k = kernel_cls(h=h)
    n = 400
    r = (np.arange(n) + 0.5) * (k.cutoff / n)
    w = np.asarray(k.W(jnp.asarray(r), dim))
    dr = k.cutoff / n
    if dim == 1:
        integral = 2.0 * np.sum(w) * dr
    elif dim == 2:
        integral = np.sum(w * 2.0 * np.pi * r) * dr
    else:
        integral = np.sum(w * 4.0 * np.pi * r**2) * dr
    assert abs(integral - 1.0) < 2e-3


@pytest.mark.parametrize("kernel_cls", KERNELS)
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_dW_is_derivative(kernel_cls, dim):
    k = kernel_cls(h=1.1)
    r = np.linspace(0.05, k.cutoff * 0.98, 50)
    eps = 1e-4
    w_p = np.asarray(k.W(jnp.asarray(r + eps), dim))
    w_m = np.asarray(k.W(jnp.asarray(r - eps), dim))
    fd = (w_p - w_m) / (2 * eps)
    dw = np.asarray(k.dW(jnp.asarray(r), dim))
    np.testing.assert_allclose(dw, fd, rtol=2e-3, atol=1e-5)


def test_compact_support():
    k = K.WendlandC2(h=1.0)
    assert float(k.W(jnp.asarray(2.0001), 2)) == 0.0
    assert float(k.dW(jnp.asarray(2.0001), 2)) == 0.0
    assert float(k.W(jnp.asarray(1.9999), 2)) > 0.0


def test_wendland_matches_reference_factors():
    """Spot values against kernel_wendland_c2.cpp closed forms."""
    h = 1.3 * 0.025
    k = K.WendlandC2(h=h)
    q = 0.8
    r = q * h
    expected = 7.0 / (4.0 * np.pi * h * h) * (1 - 0.5 * q) ** 4 * (1 + 2 * q)
    assert abs(float(k.W(jnp.asarray(r), 2)) - expected) < 1e-10
    expected_d = (1.0 / h) * 7.0 / (4.0 * np.pi * h * h) * 0.625 * (q - 2) ** 3 * q
    assert abs(float(k.dW(jnp.asarray(r), 2)) - expected_d) < 1e-9


def test_lattice_number_density():
    """sigma0 for the default h/dx=1.3 Wendland setup; W0/sigma0 should be
    close to the particle volume reciprocal scaling used by density
    summation (adaptation.cpp:26-41)."""
    dx = 0.025
    k = K.WendlandC2(h=1.3 * dx)
    sigma0 = K.lattice_number_density(k, dx, 2)
    # sigma0 ~ 1/dx^2 for a normalized kernel sampled on the lattice
    assert abs(sigma0 * dx * dx - 1.0) < 0.05
