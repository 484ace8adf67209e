"""Coverage for the oblique (parallel=False) step-kernel branches.

The config layer rejects oblique shocks exactly like the reference
(check_shock_angle, data_input.jl:70-77), so these branches are only
reachable programmatically — but they are the general-geometry
transforms the parallel fast path specializes, so they are pinned two
ways:

  1. At theta_B = 0 the oblique kernel must reproduce the parallel
     kernel (same RNG draws, trig identities reduce) to float
     rounding over a short fixed window.
  2. At theta_B > 0 in a uniform flow (no frame changes fire) elastic
     transport must conserve each lane's plasma-frame |p| exactly:
     scattering rotates momentum, the helix movement never rescales it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from montecarloscattering_jl_tpu.ops import state as stt
from montecarloscattering_jl_tpu.ops import step as stp

N_STEPS = 50
BATCH = 256


def _run(ss, state, tal, grids, sc, n_steps=N_STEPS):
    def body(i, c):
        s, t = c
        return stp.helix_step(s, t, grids, sc, ss)
    return jax.jit(lambda s, t: jax.lax.fori_loop(0, n_steps, body,
                                                  (s, t)))(state, tal)


class TestObliqueKernel:
    def test_theta_zero_matches_parallel_path(self):
        setup, state, tal, grids, sc, ss = ge._build(batch=BATCH)
        ss_obl = dataclasses.replace(ss, parallel=False)

        s_par, t_par = _run(ss, state, tal, grids, sc)
        s_obl, t_obl = _run(ss_obl, state, tal, grids, sc)

        np.testing.assert_array_equal(np.asarray(s_par.status),
                                      np.asarray(s_obl.status))
        np.testing.assert_array_equal(np.asarray(s_par.igrid),
                                      np.asarray(s_obl.igrid))
        np.testing.assert_allclose(np.asarray(s_par.pb),
                                   np.asarray(s_obl.pb),
                                   rtol=1e-8, atol=0)
        np.testing.assert_allclose(np.asarray(s_par.pperp),
                                   np.asarray(s_obl.pperp),
                                   rtol=1e-8, atol=1e-30)
        np.testing.assert_allclose(np.asarray(s_par.x),
                                   np.asarray(s_obl.x), rtol=1e-8)
        f_par = stt.finalize_tallies(t_par)
        f_obl = stt.finalize_tallies(t_obl)
        # pxz is excluded: the oblique path applies the Ellison+ (1990)
        # gyro-phase adjustment the parallel path skips, and pxz is its
        # only observable (hardcoded irrelevant for parallel shocks,
        # smoothers.jl:182-185)
        # tolerances: fluxes difference across zones near-cancel (signed
        # up/down contributions), so tiny absolute trig-form rounding
        # shows up as large relative error in near-zero zones — anchor
        # the atol to the flux scale
        pxx = np.asarray(f_par.pxx_flux)
        en = np.asarray(f_par.energy_flux)
        np.testing.assert_allclose(pxx, np.asarray(f_obl.pxx_flux),
                                   rtol=1e-6,
                                   atol=1e-9 * np.abs(pxx).max())
        np.testing.assert_allclose(en, np.asarray(f_obl.energy_flux),
                                   rtol=1e-6,
                                   atol=1e-9 * np.abs(en).max())
        psd = np.asarray(f_par.psd)
        np.testing.assert_allclose(psd, np.asarray(f_obl.psd),
                                   rtol=1e-4,
                                   atol=1e-7 * np.abs(psd).max())

    def test_oblique_uniform_flow_conserves_momentum(self):
        setup, state, tal, grids, sc, ss = ge._build(batch=BATCH)
        ss_obl = dataclasses.replace(ss, parallel=False,
                                     do_rad_losses=False)
        # uniform flow + oblique field at 30 degrees: no flow gradient
        # -> transform_p_psp never fires; scattering + helix movement
        # must conserve plasma-frame |p| exactly
        nb = len(np.asarray(grids.ux))
        u0 = float(np.asarray(grids.ux)[1])
        theta = np.pi / 6
        grids_u = grids._replace(
            ux=jnp.full(nb, u0, grids.ux.dtype),
            uz=jnp.zeros(nb, grids.uz.dtype),
            utot=jnp.full(nb, abs(u0), grids.utot.dtype),
            gamma_sf=jnp.full(nb, float(np.asarray(grids.gamma_sf)[1]),
                              grids.gamma_sf.dtype),
            b_cos=jnp.full(nb, np.cos(theta), grids.b_cos.dtype),
            b_sin=jnp.full(nb, np.sin(theta), grids.b_sin.dtype),
        )
        state_u = state._replace(
            ux_prev=jnp.full(BATCH, u0, state.ux_prev.dtype))

        ptot0 = np.asarray(state_u.ptot)
        s_out, _ = _run(ss_obl, state_u, tal, grids_u, sc)
        alive = np.asarray(s_out.status) == stt.ACTIVE
        assert alive.sum() > 0
        ptot1 = np.asarray(s_out.ptot)
        np.testing.assert_allclose(ptot1[alive], ptot0[alive],
                                   rtol=1e-12)
        # the helix actually moved and gyrated
        assert np.any(np.asarray(s_out.x)[alive]
                      != np.asarray(state_u.x)[alive])
        assert np.any(np.asarray(s_out.phi)[alive]
                      != np.asarray(state_u.phi)[alive])
