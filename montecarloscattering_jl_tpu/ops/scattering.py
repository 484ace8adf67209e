"""Pitch-angle scattering kernel (vectorized).

Re-derives scattering.jl:29-101 as a masked lane-parallel op: random
small-angle deflection on the unit sphere with maximum step set by the
mean free path lambda = eta * r_g, plus the phase-angle adjustment of
Ellison+ (1990).

All randomness is passed in as uniforms in [0,1) so the caller owns
the counter-based RNG discipline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ScatterResult(NamedTuple):
    gyro_period: jnp.ndarray   # [s]
    pb: jnp.ndarray
    pperp: jnp.ndarray
    phi: jnp.ndarray


def scattering(u1, u2, pb, pperp, phi, ptot, gamma_pf, xn_per,
               gyro_denom, is_electron, pe_crit: float,
               gamma_e_crit: float, eta_mfp: float, mc, c: float,
               cos_max=None, phase_adjust: bool = True
               ) -> ScatterResult:
    """One pitch-angle scattering event per lane (scattering.jl:29-91).

    Arguments are [B] arrays except the config scalars.  `gyro_denom`
    is 1/(z q B) [1/(esu G)]; `mc` the per-lane (species) momentum
    scale m*c.  Electrons below pe_crit scatter with a constant MFP
    set by pe_crit (scattering.jl:39-45).  `cos_max` may be
    precomputed (it depends only on xn_per and eta); `phase_adjust`
    applies the Ellison+ (1990) gyro-phase correction (observable only
    through the pxz diagnostic for parallel shocks).
    """
    const_mfp = is_electron & (ptot < pe_crit)
    g_eff = jnp.where(const_mfp, gamma_e_crit, gamma_pf)

    gyro_period = 2.0 * jnp.pi * g_eff * mc * gyro_denom

    # max deflection: cos_max = cos(sqrt(6 v_tg / (N lambda))) with
    # v_tg = 2 pi r_g and lambda = eta r_g  =>  angle depends only on
    # (N, eta) (scattering.jl:46-60)
    if cos_max is None:
        cos_max = jnp.cos(jnp.sqrt(12.0 * jnp.pi / (xn_per * eta_mfp)))

    safe_ptot = jnp.maximum(ptot, 1.0e-300)
    cos_old = pb / safe_ptot
    sin_old = pperp / safe_ptot

    cos_dt = 1.0 - u1 * (1.0 - cos_max)
    sin_dt = jnp.sqrt(jnp.maximum(1.0 - cos_dt**2, 0.0))
    phi_scat = u2 * 2.0 * jnp.pi - jnp.pi

    # spherical law of cosines (scattering.jl:74-75)
    cos_new = cos_old * cos_dt + sin_old * sin_dt * jnp.cos(phi_scat)
    cos_new = jnp.clip(cos_new, -1.0, 1.0)
    sin_new = jnp.sqrt(jnp.maximum(1.0 - cos_new**2, 0.0))

    pb_new = ptot * cos_new
    pperp_new = ptot * sin_new

    # phase-angle adjustment (get_sine_adjustment, scattering.jl:93-101)
    if phase_adjust:
        sin_dphi = jnp.where(sin_new > 0.0,
                             jnp.sin(phi_scat) * sin_dt
                             / jnp.maximum(sin_new, 1.0e-300),
                             0.0)
        limit = 1.0 - 1.0e-15
        sin_dphi = jnp.clip(sin_dphi, -limit, limit)
        phi_new = phi + jnp.arcsin(sin_dphi)
    else:
        phi_new = phi

    return ScatterResult(gyro_period, pb_new, pperp_new, phi_new)


def large_angle_scatter(u_phi, u_mu, ptot):
    """Full randomization used by the retro-time walk
    (prob_return.jl:306-311): isotropic pitch, uniform phase."""
    phi = 2.0 * jnp.pi * u_phi
    pb = (2.0 * u_mu - 1.0) * ptot
    pperp = jnp.sqrt(jnp.maximum(ptot**2 - pb**2, 0.0))
    return phi, pb, pperp


def radiation_loss(b_sq, p, dt, rad_loss_fac: float):
    """Synchrotron + IC momentum loss over one step
    (particle_loop.jl:578-592).

    d(ln p) = rad_loss_fac * B_eff^2 * p * dt, integrated implicitly
    when the explicit step would overshoot.
    """
    dlnp = rad_loss_fac * b_sq * p * dt
    return jnp.where(dlnp > 1.0e-2, p / (1.0 + dlnp), p * (1.0 - dlnp))
