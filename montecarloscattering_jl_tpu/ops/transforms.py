"""Lorentz frame transforms for particle momenta (vectorized).

Re-derives the reference's transformers (transformers.jl:440-607) as
lane-parallel jnp ops: every function maps [B]-shaped state arrays to
[B]-shaped outputs with no control flow, so they fuse into the
transport step kernel.

Momentum state convention (mirrors particle_loop.jl:207-226):
  * (pb, pperp, phi) = components of the plasma-frame momentum
    parallel/perpendicular to the local mean field B, plus gyro phase.
  * phi counts clockwise from the +z axis looking upstream; the
    perpendicular direction used in transforms is phi_p = phi + pi/2
    (Ellison, Baring & Jones 1996, Fig 14).
The oblique-correct forms are kept (they reduce to the parallel case
with b_cos = 1, b_sin = 0, uz = 0 at zero cost after constant folding).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ShockFrameMomentum(NamedTuple):
    ptot_sk: jnp.ndarray
    px_sk: jnp.ndarray
    py_sk: jnp.ndarray
    pz_sk: jnp.ndarray
    gamma_sk: jnp.ndarray


def plasma_xyz(pb, pperp, phi, b_cos, b_sin):
    """Plasma-frame xyz components from (pb, pperp, phi)
    (transformers.jl:447-459)."""
    phi_p = phi + jnp.pi / 2.0
    p_p_cos = pperp * jnp.cos(phi_p)
    px = pb * b_cos - p_p_cos * b_sin
    py = pperp * jnp.sin(phi_p)
    pz = pb * b_sin + p_p_cos * b_cos
    return px, py, pz


def transform_p_ps(pb, pperp, gamma_pf, phi, ux, uz, utot, gamma_sf,
                   b_cos, b_sin, m, c: float) -> ShockFrameMomentum:
    """Plasma -> shock frame (transform_p_PS, transformers.jl:440-476).

    `m` is the particle mass [g]; `ux`/`uz`/`utot` the local bulk flow
    [cm/s]; `gamma_sf` its Lorentz factor.
    """
    px, py, pz = plasma_xyz(pb, pperp, phi, b_cos, b_sin)
    # boost along the flow direction; for a parallel shock the flow is
    # +x so only px changes (transformers.jl:461-463)
    dpx = (gamma_sf - 1.0) * px + gamma_sf * gamma_pf * m * ux
    px_sk = px + dpx
    ptot_sk = jnp.sqrt(px_sk**2 + py**2 + pz**2)
    gamma_sk = jnp.hypot(ptot_sk / (m * c), 1.0)
    return ShockFrameMomentum(ptot_sk, px_sk, py, pz, gamma_sk)


class PlasmaMomentum(NamedTuple):
    ptot_pf: jnp.ndarray
    pb_pf: jnp.ndarray
    pperp_pf: jnp.ndarray
    gamma_pf: jnp.ndarray
    phi: jnp.ndarray


def _to_parallel_perp(px, pz, ptot, b_cos, b_sin, floor=1.0e-6):
    """Split a momentum into components parallel/perp to B, guarding the
    cancellation ptot < |pb| exactly as the reference clamps it
    (transformers.jl:562-568)."""
    pb = px * b_cos + pz * b_sin
    bad = ptot < jnp.abs(pb)
    pperp_bad = floor * ptot
    pb_bad = jnp.sign(pb) * jnp.sqrt(
        jnp.maximum(ptot**2 - pperp_bad**2, 0.0))
    pb = jnp.where(bad, pb_bad, pb)
    pperp = jnp.where(bad, pperp_bad,
                      jnp.sqrt(jnp.maximum(ptot**2 - pb**2, 0.0)))
    return pb, pperp


def transform_p_psp(pb, pperp, gamma_pf, phi,
                    ux_old, uz_old, utot_old, gamma_sf_old,
                    b_cos_old, b_sin_old,
                    ux, uz, utot, gamma_sf, b_cos, b_sin,
                    m, c: float) -> PlasmaMomentum:
    """Old plasma -> shock -> new plasma frame on a zone change
    (transform_p_PSP, transformers.jl:523-607)."""
    px, py, pz = plasma_xyz(pb, pperp, phi, b_cos_old, b_sin_old)

    # old plasma -> shock, oblique-correct boost along (ux_old, uz_old)
    ut2 = jnp.maximum(utot_old**2, 1.0e-300)
    gm1 = gamma_sf_old - 1.0
    px_sk = ((gm1 * ux_old**2 / ut2 + 1.0) * px
             + gm1 * (ux_old * uz_old / ut2) * pz
             + gamma_sf_old * gamma_pf * m * ux_old)
    pz_sk = (gm1 * (ux_old * uz_old / ut2) * px
             + (gm1 * uz_old**2 / ut2 + 1.0) * pz
             + gamma_sf_old * gamma_pf * m * uz_old)
    py_sk = py
    ptot_sk = jnp.sqrt(px_sk**2 + py_sk**2 + pz_sk**2)
    gamma_sk = jnp.hypot(ptot_sk / (m * c), 1.0)

    # shock -> new plasma
    ut2n = jnp.maximum(utot**2, 1.0e-300)
    gm1n = gamma_sf - 1.0
    px_pf = ((gm1n * ux**2 / ut2n + 1.0) * px_sk
             + gm1n * (ux * uz / ut2n) * pz_sk
             - gamma_sf * gamma_sk * m * ux)
    pz_pf = (gm1n * (ux * uz / ut2n) * px_sk
             + (gm1n * uz**2 / ut2n + 1.0) * pz_sk
             - gamma_sf * gamma_sk * m * uz)
    py_pf = py_sk
    ptot_pf = jnp.sqrt(px_pf**2 + py_pf**2 + pz_pf**2)

    pb_pf, pperp_pf = _to_parallel_perp(px_pf, pz_pf, ptot_pf, b_cos, b_sin)
    gamma_pf_new = jnp.hypot(ptot_pf / (m * c), 1.0)

    phi_p = jnp.arctan2(py_pf, -px_pf * b_sin + pz_pf * b_cos)
    phi_new = phi_p - jnp.pi / 2.0

    return PlasmaMomentum(ptot_pf, pb_pf, pperp_pf, gamma_pf_new, phi_new)


def transform_p_ps_parallel(pb, pperp, gamma_pf, ux, gamma_sf, m,
                            c: float):
    """Plasma -> shock frame for a PARALLEL shock (theta_B = 0): B is
    along x, so pb IS p_x and pperp is boost-invariant — no gyro-phase
    trigonometry is needed (the general transform_p_ps reduces to this
    with b_cos = 1, b_sin = 0, uz = 0).

    Returns (ptot_sk, px_sk, gamma_sk).
    """
    px_sk = gamma_sf * (pb + gamma_pf * m * ux)
    ptot_sk = jnp.hypot(px_sk, pperp)
    gamma_sk = jnp.hypot(ptot_sk / (m * c), 1.0)
    return ptot_sk, px_sk, gamma_sk


def transform_p_psp_parallel(pb, pperp, gamma_pf, ux_old, gamma_sf_old,
                             ux, gamma_sf, m, c: float):
    """Old plasma -> shock -> new plasma for a PARALLEL shock: only the
    parallel component boosts; pperp and the gyro phase are invariant.

    Returns (pb_new, gamma_pf_new); pperp is unchanged.
    """
    px_sk = gamma_sf_old * (pb + gamma_pf * m * ux_old)
    ptot_sk = jnp.hypot(px_sk, pperp)
    gamma_sk = jnp.hypot(ptot_sk / (m * c), 1.0)
    pb_new = gamma_sf * (px_sk - gamma_sk * m * ux)
    ptot_new = jnp.hypot(pb_new, pperp)
    gamma_new = jnp.hypot(ptot_new / (m * c), 1.0)
    return pb_new, gamma_new


def boost_x(ptot, px, gamma_rel, beta_rel, e0, c: float):
    """Boost a momentum (ptot, px) along -x by (gamma_rel, beta_rel):
    the center-point rebinning transform used in the reduction layer
    (thermo_calcs.jl:144-158, particle_counter.jl:563-575).

    Returns (ptot', px') with the same floating-point guard against
    |px'| > ptot' as the reference (thermo_calcs.jl:151-154).
    """
    etot = jnp.hypot(ptot * c, e0)
    px_t = gamma_rel * (px - beta_rel * etot / c)
    pt_t = jnp.sqrt(jnp.maximum(ptot**2 - px**2 + px_t**2, 0.0))
    px_t = jnp.where(jnp.abs(px_t) > pt_t, jnp.sign(px_t) * pt_t, px_t)
    return pt_t, px_t
