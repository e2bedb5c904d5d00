"""Materials: equations of state and constitutive laws.

TPU-native counterpart of /root/reference/src/shared/materials/.  Each
material is a frozen dataclass of static scalars exposing pure jnp
functions, so material laws inline into fused interaction kernels (the
analog of the reference's POD `EosKernel`/`ConstituteKernel` device structs,
materials/weakly_compressible_fluid.h:57, materials/elastic_solid.h:141).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Material:
    """Base material (materials/base_material.h:51)."""

    rho0: float = 1.0


@dataclasses.dataclass(frozen=True)
class Solid(Material):
    """Inert solid (walls); carries only a reference density."""


@dataclasses.dataclass(frozen=True)
class WeaklyCompressibleFluid(Material):
    """Linear-EoS weakly-compressible fluid
    (materials/weakly_compressible_fluid.cpp:17-30):
        p  = rho0 c0^2 (rho/rho0 - 1)
        c  = c0  (independent of state)
    """

    c0: float = 1.0

    @property
    def p0(self) -> float:
        return self.rho0 * self.c0 * self.c0

    def pressure(self, rho):
        return self.p0 * (rho / self.rho0 - 1.0)

    def density_from_pressure(self, p):
        return self.rho0 * (p / self.p0 + 1.0)

    def sound_speed(self, p=None, rho=None):
        return self.c0


@dataclasses.dataclass(frozen=True)
class CompressibleFluid(Material):
    """Ideal-gas compressible fluid (materials/compressible_fluid.cpp):
        p = (gamma - 1) rho e ;  c = sqrt(gamma p / rho)
    """

    gamma: float = 1.4

    def pressure(self, rho, e):
        return (self.gamma - 1.0) * rho * e

    def internal_energy(self, p, rho):
        return p / (rho * (self.gamma - 1.0))

    def sound_speed(self, p, rho):
        return jnp.sqrt(self.gamma * p / rho)


@dataclasses.dataclass(frozen=True)
class Viscosity:
    """Newtonian dynamic viscosity (materials/viscosity.h:40)."""

    mu: float = 0.0

    def __call__(self, *args):
        return self.mu


# ---------------------------------------------------------------------------
# Elastic solids (materials/elastic_solid.h:46-341).
# All laws expose:
#   stress_PK1(F)   first Piola-Kirchhoff stress from deformation gradient
#   sound speeds for the elastic time-step criterion.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ElasticSolid(Solid):
    """Base linear-elastic solid parameterized by (rho0, E, nu)."""

    youngs_modulus: float = 1.0
    poisson_ratio: float = 0.3

    @property
    def shear_modulus(self) -> float:  # G
        return 0.5 * self.youngs_modulus / (1.0 + self.poisson_ratio)

    @property
    def bulk_modulus(self) -> float:  # K
        return self.youngs_modulus / (3.0 * (1.0 - 2.0 * self.poisson_ratio))

    @property
    def lambda0(self) -> float:  # Lame first parameter
        nu, E = self.poisson_ratio, self.youngs_modulus
        return nu * E / ((1.0 + nu) * (1.0 - 2.0 * nu))

    @property
    def sound_speed(self) -> float:
        """Reference sound speed used by the elastic acoustic dt
        (materials/elastic_solid.cpp setSoundSpeeds): c0 = sqrt(K/rho0)."""
        import math

        return math.sqrt(self.bulk_modulus / self.rho0)

    def numerical_viscosity(self, smoothing_length: float) -> float:
        """Numerical damping coefficient used by the Kelvin-Voigt-type
        artificial viscosity in elastic dynamics
        (elastic_solid.cpp: 0.5 * rho0 * c0 * h)."""
        return 0.5 * self.rho0 * self.sound_speed * smoothing_length

    def stress_PK2(self, F):
        """Second Piola-Kirchhoff stress; base = linear elasticity on
        Green-Lagrange strain (Saint-Venant Kirchhoff small-strain form)."""
        dim = F.shape[-1]
        eye = jnp.eye(dim, dtype=F.dtype)
        E_green = 0.5 * (jnp.swapaxes(F, -1, -2) @ F - eye)
        return self.lambda0 * jnp.trace(E_green, axis1=-2, axis2=-1)[..., None, None] * eye \
            + 2.0 * self.shear_modulus * E_green

    def stress_PK1(self, F):
        return F @ self.stress_PK2(F)


@dataclasses.dataclass(frozen=True)
class LinearElasticSolid(ElasticSolid):
    """Alias with the reference's name (elastic_solid.h:46)."""


@dataclasses.dataclass(frozen=True)
class SaintVenantKirchhoffSolid(ElasticSolid):
    """St. Venant-Kirchhoff: S = lambda tr(E) I + 2 G E (finite strain)."""


@dataclasses.dataclass(frozen=True)
class Muscle(ElasticSolid):
    """Holzapfel-Ogden-type anisotropic muscle (elastic_solid.cpp
    Muscle::StressPK2): exponential isotropic + fiber + sheet + fiber-sheet
    invariant terms over reference directions f0/s0, plus a volumetric
    penalty.  a0/b0 follow the reference's 4-entry convention
    (iso, fiber, sheet, fiber-sheet)."""

    bulk_modulus_param: float = 1.0
    f0: tuple = (1.0, 0.0)
    s0: tuple = (0.0, 1.0)
    a0: tuple = (1.0, 0.0, 0.0, 0.0)
    b0: tuple = (1.0, 0.0, 0.0, 0.0)

    @property
    def lambda0(self) -> float:
        # Lame lambda from the bulk penalty: lambda = K - 2G/dim with the
        # reference's G = a0[0] exp(b0[0]) convention folded into the
        # isotropic term; use K-based lambda directly
        return self.bulk_modulus_param

    @property
    def sound_speed(self) -> float:
        import math

        return math.sqrt(self.bulk_modulus_param / self.rho0)

    def stress_PK2(self, F):
        dim = F.shape[-1]
        eye = jnp.eye(dim, dtype=F.dtype)
        C = jnp.swapaxes(F, -1, -2) @ F
        f0 = jnp.asarray(self.f0, dtype=F.dtype)
        s0 = jnp.asarray(self.s0, dtype=F.dtype)
        f0f0 = jnp.outer(f0, f0)
        s0s0 = jnp.outer(s0, s0)
        f0s0 = jnp.outer(f0, s0) + jnp.outer(s0, f0)
        I_ff = jnp.einsum("...ij,j,i->...", C, f0, f0) - 1.0
        I_ss = jnp.einsum("...ij,j,i->...", C, s0, s0) - 1.0
        I_fs = jnp.einsum("...ij,j,i->...", C, f0, s0)
        I_1 = jnp.trace(C, axis1=-2, axis2=-1) - dim
        J = jnp.linalg.det(F)
        Cinv = jnp.linalg.inv(C)
        a, b = self.a0, self.b0
        lam = self.lambda0
        return (a[0] * jnp.exp(b[0] * I_1))[..., None, None] * eye + \
            ((lam * (J - 1.0) - a[0]) * J)[..., None, None] * Cinv + \
            (2.0 * a[1] * I_ff * jnp.exp(b[1] * I_ff * I_ff))[..., None, None] * f0f0 + \
            (2.0 * a[2] * I_ss * jnp.exp(b[2] * I_ss * I_ss))[..., None, None] * s0s0 + \
            (a[3] * I_fs * jnp.exp(b[3] * I_fs * I_fs))[..., None, None] * f0s0


@dataclasses.dataclass(frozen=True)
class NeoHookeanSolid(ElasticSolid):
    """Compressible Neo-Hookean (elastic_solid.h NeoHookeanSolid):
        S = G J^{-2/3} (I - tr(C)/dim * C^{-1}) + K J (J-1) C^{-1}
    expressed through C = F^T F, J = det(F)."""

    def stress_PK2(self, F):
        dim = F.shape[-1]
        eye = jnp.eye(dim, dtype=F.dtype)
        C = jnp.swapaxes(F, -1, -2) @ F
        J = jnp.linalg.det(F)
        Cinv = jnp.linalg.inv(C)
        trC = jnp.trace(C, axis1=-2, axis2=-1)
        G, K = self.shear_modulus, self.bulk_modulus
        Jm23 = J ** (-2.0 / 3.0)
        dev = Jm23[..., None, None] * (eye - (trC / dim)[..., None, None] * Cinv)
        vol = (K * J * (J - 1.0))[..., None, None] * Cinv
        return G * dev + vol
