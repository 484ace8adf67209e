"""Nonlinear fixed-point convergence (BASELINE.json config 2): with
profile damping, the smoothed shock settles to flux conservation
pxx_norm ~ 1 near the shock — the reference's primary convergence
diagnostic (mc_grid.dat columns, smoothers.jl:176-177)."""

import numpy as np
import pytest

from montecarloscattering_jl_tpu.engine import run
from montecarloscattering_jl_tpu.utils import load_config

pytestmark = pytest.mark.slow


class TestNonlinearConvergence:
    def test_flux_conservation_settles(self):
        cfg = load_config("tests/data/dsa_nonrel.toml")
        cfg.n_itrs = 7
        cfg.do_smoothing = True
        cfg.prof_weight_fac = 4.0
        cfg.n_pts_inj = 150
        cfg.n_pts_pcut = 200
        cfg.n_pts_pcut_hi = 200
        res = run(cfg)
        s = res.setup
        sl = slice(s.i_shock - 10, s.i_shock + 15)
        means = np.array([itr.diag.pxx_norm[sl].mean()
                          for itr in res.iterations])
        # iteration 1 (test-particle) badly overshoots; the damped
        # fixed point oscillates around conservation
        assert means[0] > 2.0
        late = means[3:]
        assert abs(late.mean() - 1.0) < 0.4
        assert np.abs(late - 1.0).max() < np.abs(means[0] - 1.0)

        # the converged precursor decelerates the upstream flow
        prof = res.iterations[-1].profile_after
        assert prof.ux_sk[s.i_shock - 1] < 0.9 * cfg.u0
        # escaping energy flux is produced and q_esc-consistent in sign
        assert res.iterations[-1].en_esc_frac >= 0.0


class TestDegenerateSmoothingSolve:
    def test_starved_tallies_keep_profile(self):
        """A dead/starved population (Gamma_grid -> 1, near-flat flux
        solves) must NOT flatten the shock: the round-7 gamma0=5
        science run lost its far-upstream boundary this way (fac = 0
        in _rescale set the whole profile to u2, and old-profile
        averaging then relaxed the inflow toward u2 by half per
        iteration).  smooth_grid now detects the degenerate solve and
        returns the previous profile unchanged."""
        import numpy as np
        from montecarloscattering_jl_tpu.engine.setup import build_setup
        from montecarloscattering_jl_tpu.models.smoothing import (
            set_gamma_adiab_grid, smooth_grid)
        from montecarloscattering_jl_tpu.utils import load_config

        cfg = load_config("configs/baseline.toml")
        cfg.dont_scatter = False
        cfg.dont_dsa = False
        cfg.do_smoothing = True
        s = build_setup(cfg)
        prof = s.profile
        nb = s.nb
        w = cfg.prof_weight_fac
        gamma_grid = np.zeros((nb, 2))
        tiny = np.full(nb, 1e-30)
        rho0 = sum(sp.number_density * sp.mass for sp in cfg.species)
        ux_before = prof.ux_sk.copy()
        for it in range(3):
            gamma_grid = set_gamma_adiab_grid(
                gamma_grid, it, s.x_grid_cm, s.gamma2_rh, tiny, tiny,
                tiny)
            pxx = np.where(s.x_grid_rg[:nb] < 0, s.f_px_upstream,
                           0.05 * s.f_px_upstream)
            en = np.where(s.x_grid_rg[:nb] < 0, s.f_energy_upstream,
                          0.05 * s.f_energy_upstream)
            prof, _diag, w = smooth_grid(
                it, s.i_shock, prof, cfg, s.x_grid_rg, gamma_grid,
                tiny, tiny, pxx, en, 0.0, 0.0, s.f_px_upstream,
                s.f_energy_upstream, s.gamma2_rh, s.u2, s.beta2,
                s.gamma2, w, cfg.species[0].number_density,
                cfg.species[0].temperature, rho0,
                cfg.use_custom_eps_b)
        # boundary conditions intact: inflow at u0, downstream at u2
        np.testing.assert_allclose(prof.ux_sk, ux_before, rtol=0)
