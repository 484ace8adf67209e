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
