"""Testing-only config switches (mc_in.toml:132-139, SURVEY.md section
4): no-shock, no-DSA, injection fractions reduce the run to known
limits."""

import numpy as np
import pytest

from montecarloscattering_jl_tpu.engine.run import TransportEngine
from montecarloscattering_jl_tpu.engine.setup import build_setup
from montecarloscattering_jl_tpu.utils import constants as K
from montecarloscattering_jl_tpu.utils import load_config


def _cfg(**kw):
    cfg = load_config("tests/data/dsa_nonrel.toml")
    cfg.n_pts_inj = 60
    cfg.n_pts_pcut = 60
    cfg.n_pts_pcut_hi = 60
    cfg.pcuts = cfg.pcuts[:3]
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


class TestNoShock:
    def test_r_comp_one_no_heating(self):
        """no-shock forces r_comp = 1: no compression, no downstream
        heating, no acceleration above thermal."""
        cfg = _cfg(dont_shock=True, r_comp=1.0)
        setup = build_setup(cfg)
        assert setup.r_comp == 1.0
        assert setup.u2 == pytest.approx(cfg.u0)
        prof = setup.profile
        assert np.allclose(prof.ux_sk, cfg.u0)
        eng = TransportEngine(setup)
        it = eng.new_iteration_tallies()
        res = eng.run_ion(0, 0, prof, it)
        # nothing crosses the splitting momenta: the CR PSD stays empty
        assert res.psd.sum() == 0.0
        # thermal particles still streamed through and tallied
        assert res.therm_psd.sum() > 0.0


class TestNoDSA:
    def test_reflection_prevents_injection(self):
        """no-DSA reflects downstream->upstream crossers at the shock,
        so no particle is ever injected (inj flag never set) and the
        CR population above the first pcut stays thermal-only."""
        cfg = _cfg(dont_dsa=True)
        setup = build_setup(cfg)
        eng = TransportEngine(setup)
        it = eng.new_iteration_tallies()
        res = eng.run_ion(0, 0, setup.profile, it)
        # CR tally (inj lanes only) must be empty: nothing re-crossed
        assert res.psd.sum() == 0.0
        assert res.therm_psd.sum() > 0.0
        # and no upstream FEB escapes
        assert float(res.esc.esc_flux) == 0.0

    def test_inj_frac_scales_injection(self):
        """INJFR < 1 suppresses injection statistically: the injected
        population shrinks roughly with the acceptance probability."""
        pops = {}
        for frac in (1.0, 0.5):
            cfg = _cfg()
            cfg.inj_fracs = [frac]
            setup = build_setup(cfg)
            eng = TransportEngine(setup)
            it = eng.new_iteration_tallies()
            res = eng.run_ion(0, 0, setup.profile, it)
            pops[frac] = res.psd.sum()
        assert pops[1.0] > 0.0
        assert pops[0.5] < 0.75 * pops[1.0]


@pytest.mark.slow
class TestCustomFrg:
    """Custom f(r_g) MFP law (reserved+errored in the reference,
    scattering.jl:52-54): lambda = eta*r_g*(r_g/r_ref)^(alpha-1)."""

    def test_config_requires_table(self):
        import pytest as _pt
        from montecarloscattering_jl_tpu.utils.config import ConfigError
        import tomllib
        with open("tests/data/dsa_nonrel.toml", "rb") as f:
            raw = tomllib.load(f)
        raw["use-custom-frg"] = True
        from montecarloscattering_jl_tpu.utils.config import config_from_dict
        with _pt.raises(ConfigError):
            config_from_dict(raw)
        raw["custom-frg"] = {"alpha": 1.5, "rg0-rg": 2.0}
        cfg = config_from_dict(raw)
        assert cfg.frg_alpha == 1.5
        assert cfg.frg_rg0_rg == 2.0

    def test_alpha_one_matches_standard(self):
        """alpha = 1 must reproduce the standard eta*r_g law
        statistically (same formula; only the evaluation path
        differs)."""
        res = {}
        for tag, kw in (("std", {}),
                        ("frg", dict(use_custom_frg=True,
                                     frg_alpha=1.0, frg_rg0_rg=1.0))):
            cfg = _cfg(**kw)
            setup = build_setup(cfg)
            eng = TransportEngine(setup)
            it = eng.new_iteration_tallies()
            res[tag] = eng.run_ion(0, 0, setup.profile, it)
        a = res["std"].psd.sum()
        b = res["frg"].psd.sum()
        assert a > 0
        assert abs(b / a - 1.0) < 0.3, (a, b)

    def test_alpha_two_scatters_less_at_high_p(self):
        """alpha = 2 with r_ref far above thermal r_g lengthens the
        MFP with momentum => weaker high-p turnover in a short run
        (fewer scatterings per gyro => smaller cos_max deflections).
        Just assert the run completes and produces a different, finite
        spectrum."""
        cfg = _cfg(use_custom_frg=True, frg_alpha=2.0, frg_rg0_rg=1.0)
        setup = build_setup(cfg)
        eng = TransportEngine(setup)
        it = eng.new_iteration_tallies()
        res = eng.run_ion(0, 0, setup.profile, it)
        assert np.isfinite(res.psd).all()
        assert res.therm_psd.sum() > 0


@pytest.mark.slow
class TestSMPFP:
    """SMPFP > 0 blends PSD pressure into the smoother's flux solve
    (the reference errors on it, MonteCarloScattering.jl:142-147;
    here the PSD-pressure path works)."""

    def test_smpfp_run_converges(self):
        from montecarloscattering_jl_tpu.engine.driver import run
        cfg = _cfg()
        cfg.n_itrs = 2
        cfg.do_smoothing = True
        cfg.smooth_pressure_flux_psd_fac = 0.5
        res = run(cfg)
        prof = res.iterations[-1].profile_after
        assert np.all(np.isfinite(prof.ux_sk))
        # precursor still forms and downstream stays pinned
        setup = res.setup
        assert prof.ux_sk[setup.nb - 2] == pytest.approx(setup.u2,
                                                        rel=1e-6)
