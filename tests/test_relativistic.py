"""Relativistic-shock physics validation: spectral index against the
Keshet-Waxman prediction and the retro-time walk against the analytic
PRP return sampler (SURVEY.md section 7, "statistical equivalence")."""

import numpy as np
import pytest

from montecarloscattering_jl_tpu.engine.run import TransportEngine
from montecarloscattering_jl_tpu.engine.setup import build_setup
from montecarloscattering_jl_tpu.utils import constants as K
from montecarloscattering_jl_tpu.utils import load_config


def _rel_cfg():
    cfg = load_config("tests/data/electron_photon.toml")
    # protons only, no photons: pure relativistic DSA
    cfg.species = cfg.species[:1]
    cfg.inj_fracs = cfg.inj_fracs[:1]
    cfg.do_photons = False
    cfg.do_rad_losses = False
    cfg.n_pts_inj = 80
    cfg.n_pts_pcut = 120
    cfg.n_pts_pcut_hi = 120
    # downstream "thermal" protons of a gamma0=5 shock sit at
    # gamma_rel beta_rel ~ 3.4 mp c; the power law develops above that,
    # so the pcut ladder and pmax must extend well past it
    cfg.pmax = 600.0 * K.MP_C
    cfg.pcuts = [p * K.MP_C for p in
                 (0.5, 4.5, 9.0, 20.0, 45.0, 100.0, 220.0, 480.0)]
    return cfg


def _downstream_slope(setup, res, p_lo_mpc, p_hi_mpc, zone_off=5):
    p_cent = setup.bins.mom_centers
    dp = np.diff(setup.bins.mom_edges)
    zone = setup.i_shock + zone_off
    dndp = res.psd[:, :, zone].sum(axis=1) / dp
    sel = ((p_cent > p_lo_mpc * K.MP_C) & (p_cent < p_hi_mpc * K.MP_C)
           & (dndp > 0))
    x, y = np.log10(p_cent[sel]), np.log10(dndp[sel])
    return np.polyfit(x, y, 1)[0], int(sel.sum())


def keshet_waxman_index(beta0: float, beta2: float) -> float:
    """Keshet & Waxman (2005) relativistic DSA index for f(p) ~ p^-s
    (the diagnostic the reference prints, io.jl:147-151)."""
    return ((3.0 * beta0 - 2.0 * beta0 * beta2**2 + beta2**3)
            / (beta0 - beta2))


class TestRelativisticIndex:
    def test_relativistic_power_law(self):
        """gamma0 = 5 shock develops a declining downstream power law
        above the heated thermal peak (gamma_rel beta_rel ~ 3.4 mp c).

        Note on the expected index: the Keshet-Waxman value
        (s_KW ~ 4.2, computed below as the diagnostic the reference
        prints, io.jl:147-151) holds in the pitch-angle-diffusion
        limit Delta-theta << 1/Gamma_rel, which requires N_g ~ 1e4
        steps/gyroperiod — unaffordable under the 10k helix-step cap
        (which the reference shares, particle_loop.jl:162-165).  At
        test-scale N_g = 25-50 scattering is effectively large-angle,
        which is known to give flatter spectra for relativistic
        shocks, so this asserts the LAS-regime behavior: a genuine
        declining power law between the thermal peak and the pmax
        cutoff, flatter than s_KW."""
        cfg = _rel_cfg()
        setup = build_setup(cfg)
        s_kw = keshet_waxman_index(cfg.beta0, setup.beta2)
        assert s_kw == pytest.approx(4.2, abs=0.15)
        eng = TransportEngine(setup)
        it = eng.new_iteration_tallies()
        res = eng.run_ion(0, 0, setup.profile, it)
        slope, nbin = _downstream_slope(setup, res, 9.0, 150.0)
        assert nbin >= 8
        assert -(s_kw - 2.0) - 0.4 < slope < -0.4
        # the cutoff region steepens hard past pmax
        slope_cut, nb2 = _downstream_slope(setup, res, 150.0, 500.0)
        if nb2 >= 4:
            assert slope_cut < slope


class TestRetroVsAnalytic:
    def test_return_samplers_agree(self):
        """The explicit retro-time walk (prob_return.jl:217-344) and
        the analytic flux-weighted PRP return must give statistically
        matching downstream spectra — the validation the reference
        called for (prob_return.jl:130-138)."""
        slopes = {}
        returns = {}
        for retro in (False, True):
            cfg = _rel_cfg()
            cfg.do_retro = retro
            if retro:
                cfg.age_max = 1.0e30   # retro allowed, age never fires
            setup = build_setup(cfg)
            eng = TransportEngine(setup)
            it = eng.new_iteration_tallies()
            res = eng.run_ion(0, 0, setup.profile, it)
            slopes[retro], _ = _downstream_slope(setup, res, 9.0, 150.0)
            returns[retro] = float(res.psd.sum())
        # same power law within MC noise
        assert slopes[True] == pytest.approx(slopes[False], abs=0.35)
        # comparable overall CR production (within a factor ~2)
        ratio = returns[True] / returns[False]
        assert 0.4 < ratio < 2.5
