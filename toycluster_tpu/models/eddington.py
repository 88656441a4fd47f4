"""Eddington inversion: f(E) tables (host-side float64).

Numerical construction of the ergodic distribution function for the
spherical DM+gas potential (reference velocities.c:186-321, after
Kazantzidis+ 2004 / Binney & Tremaine sect. 4.3.1):

  f(E) = 1/(sqrt(8) pi^2) * int_0^E  d2rho/dpsi2 / sqrt(E - psi)  dpsi

The reference samples rho(psi) on a 4096-point log-r grid r in [0.1, 1e20],
takes d2rho/dpsi2 from a natural cubic spline, and evaluates the singular
integral with adaptive QAGS.  Since the spline's second derivative is
piecewise *linear* in psi, the integral has a closed form per knot segment —
we integrate it exactly instead, then build the same 1024-point f(E) table.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as const
from ..models import profiles
from ..models.tables import MassTable, PotentialTable, build_potential_table
from ..utils.splines import NaturalSpline

NTABLE = 1024          # velocities.c:5
NSAMPLE = 4 * NTABLE   # velocities.c:6
RMIN = 0.1             # velocities.c:7
INFINITY_R = 1e20      # velocities.c:27


@dataclass(frozen=True)
class PotentialProfile:
    """Total relative potential psi(r) = psi_DM + psi_gas of one halo."""
    a_hernq: float
    mass_dm: float
    G: float
    gas: PotentialTable | None   # None when the halo has no gas particles

    def __call__(self, r):
        r = np.asarray(r, np.float64)
        psi = profiles.hernquist_psi(r, self.mass_dm, self.a_hernq, self.G)
        if self.gas is not None:
            psi = psi + self.gas(r)
        return psi


@dataclass(frozen=True)
class DistributionFunction:
    """Tabulated f(E) with its potential; E ascending for interpolation."""
    E: np.ndarray
    fE: np.ndarray
    spline: NaturalSpline
    psi: PotentialProfile

    def __call__(self, E):
        return self.spline(np.asarray(E, np.float64))


def _exact_eddington_integral(psi_knots, m2, E_values):
    """Exact int_0^E rho''(psi)/sqrt(E-psi) dpsi for each E, where rho'' is
    the piecewise-linear second derivative of the rho(psi) spline.

    On segment [x0,x1] with rho'' = c0 + c1 psi the antiderivative in
    s = E - psi is G(s) = 2 (c0 + c1 E) sqrt(s) - (2/3) c1 s^(3/2); the
    segment contributes G(E-a) - G(E-b) with b clamped to E.
    """
    x = psi_knots
    x0 = x[:-1][None, :]                      # (1, K-1)
    x1 = x[1:][None, :]
    h = x1 - x0
    c1 = (m2[1:] - m2[:-1])[None, :] / h
    c0 = m2[:-1][None, :] - c1 * x0

    E = E_values[:, None]                     # (M, 1)
    b = np.minimum(x1, E)
    valid = b > x0
    s_a = np.maximum(E - x0, 0.0)
    s_b = np.maximum(E - b, 0.0)

    def G(s):
        sq = np.sqrt(s)
        return 2.0 * (c0 + c1 * E) * sq - (2.0 / 3.0) * c1 * s * sq

    contrib = np.where(valid, G(s_a) - G(s_b), 0.0)
    return contrib.sum(axis=1)


def build_distribution_function(*, mass_dm, a_hernq, G,
                                mass_table: MassTable | None,
                                r_sample_gas: float | None,
                                has_gas: bool) -> DistributionFunction:
    """calc_distribution_function_table (velocities.c:186-304)."""
    gas_pot = None
    if has_gas and mass_table is not None:
        gas_pot = build_potential_table(mass_table, G, r_sample_gas)
    psi_prof = PotentialProfile(a_hernq=a_hernq, mass_dm=mass_dm, G=G,
                                gas=gas_pot)

    # sample rho_DM(psi) on the oversampled grid (velocities.c:199-221)
    rstep = np.log10(INFINITY_R / RMIN) / NSAMPLE
    r = RMIN * 10.0 ** (rstep * np.arange(NSAMPLE))
    rho = profiles.hernquist_density(r, mass_dm, a_hernq)
    psi = psi_prof(r)
    psi[-1] = 0.0  # ensure E == 0 is covered (velocities.c:209)

    # ascending-psi spline of rho(psi) (velocities.c:217-234)
    x = psi[::-1].copy()
    y = rho[::-1].copy()
    rho_spline = NaturalSpline.build(x, y)

    # E grid: E_i = psi(r_i) on a 1024-point log-r grid (velocities.c:236-247)
    rstep = np.log10(INFINITY_R / RMIN) / NTABLE
    rE = RMIN * 10.0 ** (rstep * np.arange(NTABLE))
    E = psi_prof(rE)

    fE = _exact_eddington_integral(x, rho_spline.m2, E)
    fE /= np.sqrt(8.0) * const.PI ** 2

    fE[0] = fE[1]          # avoid the r=0 singularity (velocities.c:259)
    E[-1] = 0.0            # r -> inf (velocities.c:261-262)
    fE[-1] = 0.0

    # ascending-E spline (velocities.c:273-287)
    spline = NaturalSpline.build(E[::-1].copy(), fE[::-1].copy())
    return DistributionFunction(E=E[::-1].copy(), fE=fE[::-1].copy(),
                                spline=spline, psi=psi_prof)
