"""Exit bookkeeping for finished lanes.

Vectorized replacement for particle_finish! (particle_finish.jl:46-107):
after a segment drains, every FINISHED lane is transformed to the shock
frame once and scatter-added into the escape PSDs / flux accumulators
according to its exit reason.  SAVED lanes are skipped (they continue
in the next pcut), matching main_loops.jl:267-279.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.psd_bins import psd_bin_angle, psd_bin_momentum
from ..utils.constants import C_CGS
from ..utils.params import E_REL_PT, PF_SPIKE_AWAY
from . import state as st
from .state import FINISHED, ParticleState
from .step import SegmentGrids, SegmentScalars, StepStatic
from .transforms import transform_p_ps


class EscapeTallies(NamedTuple):
    esc_psd_up: jnp.ndarray      # [n_mom+1, n_theta+1] upstream/pmax escapes
    esc_psd_dw: jnp.ndarray      # [n_mom+1, n_theta+1] downstream escapes
    esc_flux: jnp.ndarray        # scalar: escaped weight (reason 2)
    px_esc_feb: jnp.ndarray      # scalar
    energy_esc_feb: jnp.ndarray  # scalar
    esc_energy_eff: jnp.ndarray  # [n_mom+1]
    esc_num_eff: jnp.ndarray     # [n_mom+1]

    @staticmethod
    def zeros(n_mom: int, n_theta: int) -> "EscapeTallies":
        z = jnp.zeros
        return EscapeTallies(
            esc_psd_up=z((n_mom + 1, n_theta + 1), jnp.float64),
            esc_psd_dw=z((n_mom + 1, n_theta + 1), jnp.float64),
            esc_flux=z((), jnp.float64),
            px_esc_feb=z((), jnp.float64),
            energy_esc_feb=z((), jnp.float64),
            esc_energy_eff=z(n_mom + 1, jnp.float64),
            esc_num_eff=z(n_mom + 1, jnp.float64),
        )

    def __add__(self, other: "EscapeTallies") -> "EscapeTallies":
        return jax.tree.map(lambda a, b: a + b, self, other)


def finish_particles(state: ParticleState, acc: EscapeTallies,
                     grids: SegmentGrids, sc: SegmentScalars,
                     ss: StepStatic) -> EscapeTallies:
    """Accumulate exit tallies for all FINISHED lanes of a segment."""
    c = C_CGS
    m = sc.m
    e0 = m * c * c

    fin = (state.status == FINISHED) & (state.weight > 0.0)
    w = jnp.where(fin, state.weight, 0.0)

    ig = state.igrid
    sk = transform_p_ps(
        state.pb, state.pperp,
        jnp.hypot(jnp.hypot(state.pb, state.pperp) / (m * c), 1.0),
        state.phi, grids.ux[ig], grids.uz[ig], grids.utot[ig],
        grids.gamma_sf[ig], grids.b_cos[ig], grids.b_sin[ig], m, c)

    ip = psd_bin_momentum(sk.ptot_sk, ss.psd_mom_min, ss.bins_per_dec_mom,
                          ss.n_mom)
    jt = psd_bin_angle(sk.px_sk, sk.ptot_sk, ss.cos_fine, ss.dcos,
                       ss.theta_min, ss.bins_per_dec_theta, ss.n_theta)

    # 1/|v_x| weighting with the spike clamp (particle_finish.jl:74-78)
    spike = sk.ptot_sk > jnp.abs(PF_SPIKE_AWAY * sk.px_sk)
    wf = jnp.where(
        spike,
        sk.gamma_sk * m * PF_SPIKE_AWAY
        / jnp.maximum(sk.ptot_sk, 1.0e-300),
        sk.gamma_sk * m / jnp.maximum(jnp.abs(sk.px_sk), 1.0e-300))

    rel = (sk.gamma_sk - 1.0) >= E_REL_PT
    e_kin = jnp.where(rel, (sk.gamma_sk - 1.0) * e0,
                      sk.ptot_sk**2 / (2.0 * m))

    is_dw = fin & (state.reason == st.R_DOWNSTREAM)
    is_up = fin & (state.reason == st.R_UPSTREAM_PMAX)

    wwf = (w * wf).astype(jnp.float64)
    we = (w * e_kin).astype(jnp.float64)
    wd = w.astype(jnp.float64)

    return EscapeTallies(
        esc_psd_dw=acc.esc_psd_dw.at[ip, jt].add(jnp.where(is_dw, wwf, 0.0)),
        esc_psd_up=acc.esc_psd_up.at[ip, jt].add(jnp.where(is_up, wwf, 0.0)),
        esc_flux=acc.esc_flux + jnp.sum(jnp.where(is_up, wd, 0.0)),
        px_esc_feb=acc.px_esc_feb + jnp.sum(
            jnp.where(is_up, jnp.abs(sk.px_sk).astype(jnp.float64) * wd,
                      0.0)),
        energy_esc_feb=acc.energy_esc_feb + jnp.sum(
            jnp.where(is_up, we, 0.0)),
        esc_energy_eff=acc.esc_energy_eff.at[ip].add(
            jnp.where(is_up, we, 0.0)),
        esc_num_eff=acc.esc_num_eff.at[ip].add(jnp.where(is_up, wd, 0.0)),
    )


finish_particles_jit = jax.jit(finish_particles, static_argnums=(4,))
