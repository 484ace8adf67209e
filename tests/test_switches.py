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
