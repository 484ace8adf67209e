"""Unit tests for the foundations layer (utils + models init).

Closed-form anchors follow SURVEY.md section 4: R-H ratios, grid shape,
PSD bin formulas, M-B sampling moments, upstream flux limits.
"""

import math
import os

import numpy as np
import pytest

from montecarloscattering_jl_tpu.models import grid as grid_mod
from montecarloscattering_jl_tpu.models import psd_bins as pb
from montecarloscattering_jl_tpu.models.fluxes import (
    upstream_fluxes, upstream_machs)
from montecarloscattering_jl_tpu.models.injection import init_pop, set_inj_dist
from montecarloscattering_jl_tpu.models.profile import setup_profile
from montecarloscattering_jl_tpu.models.rankine_hugoniot import (
    calc_downstream, calc_rRH, q_esc_calcs)
from montecarloscattering_jl_tpu.utils import constants as K
from montecarloscattering_jl_tpu.utils.config import ConfigError, load_config
from montecarloscattering_jl_tpu.utils.cosmology import (
    comoving_radial_dist, get_redshift)
from montecarloscattering_jl_tpu.utils.species import Species, lorentz


def _species(n_p=1.0, t=1.0e6):
    return [
        Species(K.MP_CGS, K.QE_CGS, t, n_p),
        Species(K.ME_CGS, -K.QE_CGS, t, 0.0),
    ]


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

class TestConfig:
    def test_baseline_parses(self):
        cfg = load_config("configs/baseline.toml")
        assert cfg.gamma0 == 5.0
        assert abs(cfg.beta0 - math.sqrt(1 - 1 / 25)) < 1e-14
        assert cfg.n_ions == 2
        assert cfg.species[1].is_electron
        assert cfg.species[0].aa == 1.0
        assert len(cfg.pcuts) == 45
        # pcuts are stored in g cm/s
        assert abs(cfg.pcuts[0] / K.MP_C - 0.01) < 1e-12
        assert cfg.use_prp  # downstream FEB <= 0 selects PRP
        assert cfg.dont_scatter and cfg.dont_dsa
        assert cfg.do_tcuts and len(cfg.tcuts) == 10
        assert cfg.pe_crit > 0  # 1e4 keV threshold set
        # rg0 = gamma0 mp c^2 beta0 / (q B0)
        rg0 = cfg.gamma0 * K.MP_C2 * cfg.beta0 / (K.QE_CGS * cfg.bmag0)
        assert abs(cfg.rg0 / rg0 - 1) < 1e-14

    def test_reference_mc_in_drops_in(self):
        """The reference's own input file is directly loadable — a user
        switching frameworks reuses their mc_in.toml unchanged
        (/root/reference/mc_in.toml)."""
        import dataclasses

        ref = "/root/reference/mc_in.toml"
        if not os.path.exists(ref):
            pytest.skip("reference checkout not present")
        cfg_ref = load_config(ref)
        cfg_here = load_config("configs/baseline.toml")
        for f in dataclasses.fields(cfg_ref):
            a, b = getattr(cfg_ref, f.name), getattr(cfg_here, f.name)
            if isinstance(a, np.ndarray):
                np.testing.assert_allclose(a, b, rtol=1e-12,
                                           err_msg=f.name)
            elif f.name != "species":
                assert a == b, (f.name, a, b)
        assert cfg_ref.gamma0 == 5.0 and len(cfg_ref.pcuts) == 45

    def test_invalid_configs_rejected(self):
        import tomllib
        with open("configs/baseline.toml", "rb") as f:
            base = tomllib.load(f)
        from montecarloscattering_jl_tpu.utils.config import config_from_dict

        bad = dict(base); bad["theta-B0"] = 10.0
        with pytest.raises(ConfigError):
            config_from_dict(bad)
        # SMPFP in [0, 1] is now SUPPORTED (the PSD-pressure blend the
        # reference reserves, MonteCarloScattering.jl:142-147); only
        # out-of-range values reject
        bad = dict(base); bad["SMPFP"] = 1.5
        with pytest.raises(ConfigError):
            config_from_dict(bad)
        ok = dict(base); ok["SMPFP"] = 0.5
        assert config_from_dict(ok).smooth_pressure_flux_psd_fac == 0.5
        bad = dict(base); bad["maximum-energy"] = [0, 0, 0]
        with pytest.raises(ConfigError):
            config_from_dict(bad)
        bad = dict(base); bad["shock-speed"] = 0.5  # gamma must be > 1
        with pytest.raises(ConfigError):
            config_from_dict(bad)

    def test_auto_pcut_ladder(self):
        """pcuts-per-decade (extension): geometric ladder anchored at
        the first explicit cut, covering the configured Emax plus one
        guard level, and passing the reference's check_pcuts rule."""
        import tomllib
        with open("configs/baseline.toml", "rb") as f:
            base = tomllib.load(f)
        from montecarloscattering_jl_tpu.utils.config import (
            config_from_dict)

        auto = dict(base); auto["pcuts-per-decade"] = 4
        cfg = config_from_dict(auto)
        p = np.asarray(cfg.pcuts)
        # anchored at the explicit first cut, exact 10^(1/4) spacing
        assert p[0] == pytest.approx(0.01 * K.MP_C, rel=1e-12)
        np.testing.assert_allclose(p[1:] / p[:-1], 10.0 ** 0.25,
                                   rtol=1e-12)
        # second-highest level reaches the proton momentum at Emax
        from montecarloscattering_jl_tpu.engine.run import pmax_cutoff
        p_need = pmax_cutoff(cfg, K.MP_CGS)
        assert p[-2] >= p_need * (1 - 1e-12) > p[-4]
        assert len(p) <= 100
        # too-dense ladders exceed NA_C and reject
        bad = dict(base); bad["pcuts-per-decade"] = 20
        with pytest.raises(ConfigError):
            config_from_dict(bad)
        # empty anchor list rejects with ConfigError, not IndexError
        bad = dict(base); bad["pcuts-per-decade"] = 4
        bad["momentum-cutoffs"] = []
        with pytest.raises(ConfigError):
            config_from_dict(bad)

    def test_auto_pcut_ladder_heavy_species(self):
        """Coverage must reach the escape momentum of the HEAVIEST
        species: p(E) = mc sqrt((1+E/mc^2)^2-1) grows with mass, so an
        Fe (aa=56) run needs a higher top than protons."""
        from montecarloscattering_jl_tpu.utils.config import (
            auto_pcut_ladder)

        p0 = 0.01 * K.MP_C
        emax_aa = 2.0 * K.MP_C2      # trans-relativistic per-nucleon
        p_p = auto_pcut_ladder(p0, 4, 0.0, emax_aa, 0.0, aa_max=1.0)
        p_fe = auto_pcut_ladder(p0, 4, 0.0, emax_aa, 0.0, aa_max=56.0)
        # escape momentum with the engine's pmax_cutoff form (reference
        # quirk: gamma = 1 + E_per_aa / (aa m_p c^2), ion_init.jl:61)
        m = 56.0 * K.MP_CGS
        g = 1.0 + emax_aa / (m * K.C_CGS**2)
        p_need_fe = m * K.C_CGS * math.sqrt(g * g - 1.0)
        assert p_fe[-2] >= p_need_fe * (1 - 1e-12)
        assert p_fe[-1] > p_p[-1]    # heavier -> higher top


# ---------------------------------------------------------------------------
# Rankine-Hugoniot
# ---------------------------------------------------------------------------

class TestRankineHugoniot:
    def test_nonrel_strong_shock_r4(self):
        """Ellison (1985) Eq 11: strong nonrel shock compresses by 4."""
        b0 = 3.0e8 / K.C_CGS  # 3000 km/s, Mach >> 1
        r, g2 = calc_rRH(b0, lorentz(b0), _species())
        assert abs(r - 4.0) < 0.05
        assert g2 == pytest.approx(5.0 / 3.0)

    def test_nonrel_mach_dependence(self):
        """r = 8 / (2 + 6/M^2) exactly."""
        b0 = 0.01
        sp = _species(t=1.0e6)
        p0 = sum(s.number_density * s.temperature for s in sp) * K.KB_CGS
        rho0 = sum(s.number_density * s.mass for s in sp)
        mach = b0 * K.C_CGS / math.sqrt(5 / 3 * p0 / rho0)
        r, _ = calc_rRH(b0, lorentz(b0), sp)
        assert r == pytest.approx(8.0 / (2.0 + 6.0 / mach**2), rel=1e-12)

    def test_rel_gamma5(self):
        """gamma0=5 cold shock: r_RH near the 3.00884 quoted in the
        reference's mc_in.toml:157 (delta-shell EOS gives 3.058)."""
        g0 = 5.0
        b0 = math.sqrt(1 - 1 / g0**2)
        r, g2 = calc_rRH(b0, g0, _species())
        assert 2.9 < r < 3.2
        assert 4.0 / 3.0 < g2 < 5.0 / 3.0

    def test_ultrarelativistic_limit(self):
        g0 = 1000.0
        b0 = math.sqrt(1 - 1 / g0**2)
        r, g2 = calc_rRH(b0, g0, _species())
        assert abs(r - 3.0) < 0.01
        assert abs(g2 - 4.0 / 3.0) < 0.01

    def test_calc_downstream(self):
        beta2, gamma2, b2, th_b, th_u = calc_downstream(1e-5, 4.0, 0.4)
        assert beta2 == pytest.approx(0.1)
        assert gamma2 == pytest.approx(lorentz(0.1))
        assert b2 == 1e-5 and th_b == 0.0 and th_u == 0.0

    def test_q_esc_zero_at_rRH(self):
        g0, sp = 5.0, _species()
        b0 = math.sqrt(1 - 1 / g0**2)
        r, g2 = calc_rRH(b0, g0, sp)
        q_px, q_en = q_esc_calcs(g2, r, r, b0 * K.C_CGS, b0, g0, sp,
                                 lorentz(b0 / r), b0 / r, b0 * K.C_CGS / r)
        assert q_px == 0.0 and q_en == 0.0

    def test_q_esc_positive_above_rRH(self):
        """Higher compression than r_RH implies escaping flux."""
        g0, sp = 5.0, _species()
        b0 = math.sqrt(1 - 1 / g0**2)
        r_rh, g2 = calc_rRH(b0, g0, sp)
        r = 1.3 * r_rh
        b2 = b0 / r
        q_px, q_en = q_esc_calcs(g2, r, r_rh, b0 * K.C_CGS, b0, g0, sp,
                                 lorentz(b2), b2, b2 * K.C_CGS)
        assert q_en > 0.0
        assert 0.0 < q_en < 1.0


# ---------------------------------------------------------------------------
# grid
# ---------------------------------------------------------------------------

class TestGrid:
    def test_baseline_grid_shape(self):
        """101 boundaries -> 99 zones with +-1e30 sentinels
        (SURVEY.md section 0)."""
        rg0 = 1.0e10
        x, x_start, x_stop = grid_mod.setup_grid(-1e7, 10.0, True, -1.0, rg0)
        assert len(x) == 101
        assert x[0] == -1e30 and x[-1] == 1e30
        assert np.all(np.diff(x) > 0)
        assert x_start == -1e7 * rg0 and x_stop == 10.0 * rg0
        i_shock = grid_mod.find_shock_index(x)
        assert x[i_shock] == 0.0

    def test_feb_index(self):
        rg0 = 1.0
        x, _, _ = grid_mod.setup_grid(-1e7, 10.0, True, -1.0, rg0)
        i = grid_mod.find_feb_index(x * rg0, -100.0)
        assert x[i] <= -100.0 < x[i + 1]

    def test_photon_shells(self):
        rg0 = 3.0e10
        mid, end = grid_mod.set_photon_shells(5, 2, True, -100 * rg0, -1.0,
                                              rg0, 10.0)
        assert len(mid) == 7 and len(end) == 8
        assert np.all(np.diff(end) > 0)
        assert end[0] == pytest.approx(-100 * rg0)      # upstream FEB
        assert end[5] == 0.0                            # shock
        assert end[-1] == pytest.approx(10.0 * rg0)     # grid stop


# ---------------------------------------------------------------------------
# PSD bins
# ---------------------------------------------------------------------------

class TestPsdBins:
    def _bins(self):
        return pb.build_psd_bins(
            _species(), inp_distr=1, energy_inj=0.0, emin_therm_fac=0.01,
            emax=0.0, emax_per_aa=0.0, pmax=1e10 * K.MP_C, gamma0=5.0,
            bins_per_dec_mom=10, bins_per_dec_theta=10, lin_cos_bins=119,
            log_theta_decs=4)

    def test_bin_structure(self):
        b = self._bins()
        assert b.mom_bounds_log[0] == -99.0
        assert len(b.mom_bounds_log) == b.n_mom + 2
        # log spacing of 1/bins_per_dec
        d = np.diff(b.mom_bounds_log[1:])
        assert np.allclose(d, 0.1)
        # angle bins: log-theta + linear cosine regions
        assert len(b.theta_bounds) == b.n_theta + 2
        # monotone in angle: the cos_bounds view ascends from -1 to +1
        cb = b.cos_bounds()
        assert np.all(np.diff(cb) > 0)
        assert cb[0] == pytest.approx(-1.0)
        assert cb[-1] == pytest.approx(1.0)
        # 119 linear cos bins + 4 decades of log theta at 10/dec
        assert b.lin_cos_bins == 119
        assert b.n_theta == 119 + 40

    def test_momentum_bin_lookup(self):
        b = self._bins()
        import jax.numpy as jnp
        p = jnp.asarray([b.psd_mom_min * 0.5,
                         b.psd_mom_min * 1.001,
                         b.psd_mom_min * 10**2.55,
                         b.psd_mom_min * 1e40])
        idx = pb.psd_bin_momentum(p, b.psd_mom_min, b.bins_per_dec_mom,
                                  b.n_mom)
        assert idx[0] == 0
        assert idx[1] == 1
        assert idx[2] == 26
        assert idx[3] == b.n_mom  # overflow clamp

    def test_angle_bin_lookup_matches_reference_formula(self):
        b = self._bins()
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        ptot = np.ones(1000)
        px = rng.uniform(-1, 1, 1000)
        idx = np.asarray(pb.psd_bin_angle(
            jnp.asarray(px), jnp.asarray(ptot), b.cos_fine, b.dcos,
            b.theta_min, b.bins_per_dec_theta, b.n_theta))
        for k in range(0, 1000, 97):
            p_cos = -px[k]
            if p_cos < b.cos_fine:
                want = b.n_theta - int((p_cos + 1) / b.dcos)
            else:
                th = math.acos(p_cos)
                want = 0 if th < b.theta_min else int(
                    math.log10(th / b.theta_min) * b.bins_per_dec_theta) + 1
            assert idx[k] == min(want, b.n_theta)

    def test_upstream_pointing_gets_fine_bins(self):
        """Particles moving upstream (px < 0) land in the low
        (log-theta) bins (get_psd_bins.jl:55-59)."""
        b = self._bins()
        import jax.numpy as jnp
        up = pb.psd_bin_angle(jnp.asarray([-1.0]), jnp.asarray([1.0]),
                              b.cos_fine, b.dcos, b.theta_min,
                              b.bins_per_dec_theta, b.n_theta)
        down = pb.psd_bin_angle(jnp.asarray([1.0]), jnp.asarray([1.0]),
                                b.cos_fine, b.dcos, b.theta_min,
                                b.bins_per_dec_theta, b.n_theta)
        assert up[0] <= 1
        assert down[0] == b.n_theta

    def test_cos_centers(self):
        b = self._bins()
        cc = b.cos_centers()
        assert cc.shape == (b.n_theta + 1,)
        # centers run from ~-1 (upstream) to ~+1 (downstream)
        assert cc[0] < -0.999
        assert cc[-1] > 0.98
        assert np.all(np.diff(cc) > 0)


# ---------------------------------------------------------------------------
# injection
# ---------------------------------------------------------------------------

class TestInjection:
    def test_mb_moments_equal_weight(self):
        """Mean kinetic energy of the sampled M-B distribution must be
        (3/2) k T within binning error."""
        t = 1.0e6
        ptot, w = set_inj_dist(True, 20000, 1, t, K.MP_CGS, 1.0)
        ke = ptot**2 / (2 * K.MP_CGS)
        mean_ke = float(np.sum(ke * w) / np.sum(w))
        assert mean_ke == pytest.approx(1.5 * K.KB_CGS * t, rel=0.05)
        # total weight = species density
        assert float(np.sum(w)) == pytest.approx(1.0, rel=1e-12)

    def test_mb_moments_equal_bins(self):
        t = 1.0e6
        ptot, w = set_inj_dist(False, 1000, 1, t, K.MP_CGS, 2.5)
        ke = ptot**2 / (2 * K.MP_CGS)
        mean_ke = float(np.sum(ke * w) / np.sum(w))
        assert mean_ke == pytest.approx(1.5 * K.KB_CGS * t, rel=0.05)
        assert float(np.sum(w)) == pytest.approx(2.5, rel=1e-6)

    def test_delta_distribution(self):
        e_inj = 1.0e3 * K.KEV_ERG
        ptot, w = set_inj_dist(True, 100, 2, e_inj, K.MP_CGS, 1.0)
        assert len(ptot) == 100
        # 1 MeV proton is nonrelativistic: p = sqrt(2 m E)
        assert np.allclose(ptot, math.sqrt(2 * K.MP_CGS * e_inj))
        assert np.allclose(w, 0.01)

    def test_init_pop_no_fast_push(self):
        rng = np.random.default_rng(1)
        sp = _species()
        x_grid, x_start, _ = grid_mod.setup_grid(-1e7, 10.0, True, -1.0, 1e10)
        pop = init_pop(rng, sp, 0, 1, 0.0, True, 1000, x_start, 1e10, 1.0,
                       False, 0.0, 0.98, 5.0, 0.98 * K.C_CGS,
                       x_grid, np.ones(101), np.ones(101))
        assert np.all(np.abs(pop.pb_pf) <= pop.ptot_pf)
        assert np.all(pop.x_cm == x_start - 10 * 1e10)
        assert np.all(pop.pxx_flux == 0)


# ---------------------------------------------------------------------------
# fluxes, profile, cosmology
# ---------------------------------------------------------------------------

class TestFluxes:
    def test_nonrel_limits(self):
        sp = _species(t=1.0e4)
        b0 = 0.005
        u0 = b0 * K.C_CGS
        f_px, f_pz, f_en = upstream_fluxes(sp, 1e-5, 0.0, u0, b0, lorentz(b0))
        rho0 = K.MP_CGS
        assert f_px == pytest.approx(rho0 * u0**2, rel=1e-3)
        assert f_en == pytest.approx(0.5 * rho0 * u0**3, rel=1e-2)
        assert f_pz == 0.0

    def test_machs(self):
        sp = _species()
        ms, ma = upstream_machs(0.98, sp, 1e-5)
        assert ms > 1 and ma > 1
        # classical check at low speed: cs = sqrt(5/3 P/rho)
        ms2, ma2 = upstream_machs(0.001, sp, 1e-5)
        p0 = K.KB_CGS * 1e6
        cs = math.sqrt(5 / 3 * p0 / K.MP_CGS)
        assert ms2 == pytest.approx(0.001 * K.C_CGS / cs, rel=1e-12)
        va = 1e-5 / math.sqrt(4 * math.pi * K.MP_CGS)
        assert ma2 == pytest.approx(0.001 * K.C_CGS / va, rel=1e-12)


class TestProfile:
    def test_step_profile(self):
        sp = _species()
        g0 = 5.0
        b0 = math.sqrt(1 - 1 / g0**2)
        u0 = b0 * K.C_CGS
        x_grid, _, _ = grid_mod.setup_grid(-1e7, 10.0, True, -1.0, 1e10)
        f_px, f_pz, f_en = upstream_fluxes(sp, 1e-5, 0.0, u0, b0, g0)
        prof = setup_profile(u0, b0, g0, 1e-5, 0.0, 3.0, 0.0, 1.0, False,
                             sp, f_px, f_en, x_grid * 1e10, x_grid)
        i_shock = grid_mod.find_shock_index(x_grid)
        assert np.all(prof.ux_sk[:i_shock] == u0)
        assert np.all(prof.ux_sk[i_shock:] == pytest.approx(u0 / 3.0))
        assert prof.gamma_ef[0] == 1.0
        assert prof.beta_ef[-1] == pytest.approx(
            (b0 - b0 / 3) / (1 - b0 * b0 / 3))
        assert prof.bmag2 == pytest.approx(1e-5)  # bturb=0 -> no change

    def test_turbulence_compression(self):
        sp = _species()
        g0 = 5.0
        b0 = math.sqrt(1 - 1 / g0**2)
        u0 = b0 * K.C_CGS
        x_grid, _, _ = grid_mod.setup_grid(-1e7, 10.0, True, -1.0, 1e10)
        f_px, f_pz, f_en = upstream_fluxes(sp, 1e-5, 0.0, u0, b0, g0)
        prof = setup_profile(u0, b0, g0, 1e-5, 0.0, 3.0, 1.0, 1.0, False,
                             sp, f_px, f_en, x_grid * 1e10, x_grid)
        # fully compressed turbulence: B2/B0 = sqrt((1+2z^2)/3), z ~ r
        z = g0 * u0 / (prof.gamma_sf[-1] * prof.ux_sk[-1])
        assert prof.bmag2 == pytest.approx(
            1e-5 * math.sqrt((1 + 2 * z**2) / 3), rel=1e-12)


class TestCosmology:
    def test_roundtrip(self):
        for z in [0.1, 0.5, 1.0, 3.0]:
            d = comoving_radial_dist(z)
            assert get_redshift(d) == pytest.approx(z, rel=1e-8)

    def test_small_distance_shortcut(self):
        assert get_redshift(0.1) == 0.0
