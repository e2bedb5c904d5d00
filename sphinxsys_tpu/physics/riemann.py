"""Low-dissipation acoustic Riemann solvers for pairwise WCSPH dissipation.

Counterpart of /root/reference/src/shared/materials/riemann_solver.h:55-124.
Frozen dataclasses of static floats; the jump functions are pure jnp and
inline into the interaction kernels.

For two weakly-compressible fluids i/j (rho0c0 = rho0 * c0 per side):
    DissipativePJump(du) = rho0c0_geo * du * limiter(inv_c0_ave * max(du,0))
    DissipativeUJump(dp) = dp * inv_rho0c0_ave
with the truncated-linear limiter  min(coeff * x, 1), coeff = 3
(riemann_solver.h:87-99, common_functors.h:82).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoRiemannSolver:
    """Central scheme — no dissipation (riemann_solver.h:55)."""

    rho0c0_i: float
    rho0c0_j: float
    inv_c0_ave: float = 0.0  # 0.5 (rho0_i + rho0_j) * inv_rho0c0_ave

    @property
    def inv_rho0c0_sum(self) -> float:
        return 1.0 / (self.rho0c0_i + self.rho0c0_j)

    @property
    def inv_rho0c0_ave(self) -> float:
        return (self.rho0c0_i + self.rho0c0_j) / (self.rho0c0_i**2 + self.rho0c0_j**2)

    @property
    def rho0c0_geo_ave(self) -> float:
        return 2.0 * self.rho0c0_i * self.rho0c0_j * self.inv_rho0c0_sum

    def dissipative_p_jump(self, u_jump):
        return jnp.zeros_like(u_jump)

    def dissipative_u_jump(self, p_jump):
        return jnp.zeros_like(p_jump)

    def average_p(self, p_i, p_j):
        return (p_i * self.rho0c0_j + p_j * self.rho0c0_i) * self.inv_rho0c0_sum

    def average_v(self, v_i, v_j):
        return (v_i * self.rho0c0_i + v_j * self.rho0c0_j) * self.inv_rho0c0_sum


@dataclasses.dataclass(frozen=True)
class AcousticRiemannSolver(NoRiemannSolver):
    """BaseAcousticRiemannSolver<TruncatedLinear> (riemann_solver.h:83-123)."""

    limiter_coeff: float = 3.0

    def _limiter(self, x):
        return jnp.minimum(self.limiter_coeff * x, 1.0)

    def dissipative_p_jump(self, u_jump):
        return self.rho0c0_geo_ave * u_jump * self._limiter(self.inv_c0_ave * jnp.maximum(u_jump, 0.0))

    def dissipative_u_jump(self, p_jump):
        return p_jump * self.inv_rho0c0_ave


@dataclasses.dataclass(frozen=True)
class DissipativeRiemannSolver(AcousticRiemannSolver):
    """BaseAcousticRiemannSolver<NoLimiter>: limiter == 1."""

    def _limiter(self, x):
        return jnp.ones_like(x)


def _inv_c0_ave(fluid_i, fluid_j) -> float:
    rc_i, rc_j = fluid_i.rho0 * fluid_i.c0, fluid_j.rho0 * fluid_j.c0
    inv_rho0c0_ave = (rc_i + rc_j) / (rc_i**2 + rc_j**2)
    return 0.5 * (fluid_i.rho0 + fluid_j.rho0) * inv_rho0c0_ave


def acoustic_riemann(fluid_i, fluid_j=None, limiter_coeff: float = 3.0) -> AcousticRiemannSolver:
    """Build from material objects (WeaklyCompressibleFluid)."""
    fluid_j = fluid_j or fluid_i
    return AcousticRiemannSolver(
        rho0c0_i=fluid_i.rho0 * fluid_i.c0, rho0c0_j=fluid_j.rho0 * fluid_j.c0,
        inv_c0_ave=_inv_c0_ave(fluid_i, fluid_j), limiter_coeff=limiter_coeff)


def dissipative_riemann(fluid_i, fluid_j=None) -> DissipativeRiemannSolver:
    fluid_j = fluid_j or fluid_i
    return DissipativeRiemannSolver(
        rho0c0_i=fluid_i.rho0 * fluid_i.c0, rho0c0_j=fluid_j.rho0 * fluid_j.c0,
        inv_c0_ave=_inv_c0_ave(fluid_i, fluid_j))


def no_riemann(fluid_i, fluid_j=None) -> NoRiemannSolver:
    fluid_j = fluid_j or fluid_i
    return NoRiemannSolver(rho0c0_i=fluid_i.rho0 * fluid_i.c0,
                           rho0c0_j=fluid_j.rho0 * fluid_j.c0,
                           inv_c0_ave=_inv_c0_ave(fluid_i, fluid_j))
