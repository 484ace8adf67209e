"""End-to-end electron + photon run (BASELINE.json configs 3 and 4):
relativistic shock with protons + electrons, radiative losses, and the
full synchrotron / inverse-Compton / pi0-decay SED."""

import os

import numpy as np
import pytest

from montecarloscattering_jl_tpu.engine import run
from montecarloscattering_jl_tpu.utils import constants as K
from montecarloscattering_jl_tpu.utils import load_config


@pytest.fixture(scope="module")
def photon_result(tmp_path_factory):
    cfg = load_config("tests/data/electron_photon.toml")
    out = tmp_path_factory.mktemp("photons")
    return run(cfg, out_dir=str(out)), out


class TestElectronRun:
    def test_electrons_accelerate(self, photon_result):
        res, _ = photon_result
        fi_e = res.iterations[-1].ion_finals[1]
        setup = res.setup
        zone = setup.i_shock + 4
        dnd = fi_e.dndp_cr[:, zone, 1]
        nz = dnd > 1e-60
        assert nz.any()
        p_max = setup.bins.mom_centers[nz].max()
        # electrons reach at least ~ 1 mp c (~ 2e3 me c)
        assert p_max > 1.0 * K.MP_C

    def test_both_species_transported(self, photon_result):
        res, _ = photon_result
        assert len(res.iterations[-1].ion_finals) == 2
        for fi in res.iterations[-1].ion_finals:
            assert fi.psd.sum() > 0


class TestPhotonSED:
    def test_all_three_processes_emit(self, photon_result):
        res, _ = photon_result
        em = res.iterations[-1].emission
        assert em is not None
        for shell in (em.pion_shell, em.synch_shell, em.ic_shell):
            assert shell.max() > 1e-90

    def test_pion_bump_location(self, photon_result):
        """pi0 spectra rise above the 67.5 MeV half-pion-mass point and
        peak in the GeV range for a hard proton spectrum."""
        res, _ = photon_result
        em = res.iterations[-1].emission
        tot = em.pion_shell.sum(axis=1)
        e_peak_mev = em.e_pion[np.argmax(tot)] / K.MEV_ERG
        assert 50.0 < e_peak_mev < 1e6
        # nothing below the kinematic floor of the grid
        assert em.e_pion[0] / K.MEV_ERG == pytest.approx(1.0, rel=1e-9)

    def test_synch_band(self, photon_result):
        """Synchrotron peak frequency ~ 4.2e6 gamma_max^2 (B/G) Hz for
        the accelerated electrons."""
        res, _ = photon_result
        em = res.iterations[-1].emission
        tot = em.synch_shell.sum(axis=1)
        e_peak = em.e_synch[np.argmax(tot)]
        nu_peak = e_peak / K.H_CGS
        assert 1e9 < nu_peak < 1e16   # radio-to-UV for these parameters

    def test_ic_above_grid_floor(self, photon_result):
        res, _ = photon_result
        em = res.iterations[-1].emission
        tot = em.ic_shell.sum(axis=1)
        assert tot.max() > 1e-90
        e_peak_mev = em.e_ic[np.argmax(tot)] / K.MEV_ERG
        assert 1e-2 <= e_peak_mev < 1e6

    def test_total_sed_merges_all(self, photon_result):
        res, _ = photon_result
        em = res.iterations[-1].emission
        assert (em.tot > 1e-90).sum() > 100
        # total at a pion-band energy >= pion contribution alone
        j = np.argmin(abs(em.e_tot - 1e3 * K.MEV_ERG))
        assert em.tot[j] >= em.pion_shell.sum(axis=1)[
            np.argmin(abs(em.e_pion - em.e_tot[j]))] * 0.5

    def test_photon_files_written(self, photon_result):
        _, out = photon_result
        names = sorted(os.listdir(out))
        for want in ("photon_pion_decay_grid.dat", "photon_synch_grid.dat",
                     "photon_IC_grid.dat", "photon_pion_summed.dat",
                     "photon_synch_summed.dat", "photon_IC_summed.dat",
                     "photon_tot_summed.dat", "photon_tot.dat"):
            assert want in names
        tot = open(os.path.join(out, "photon_tot.dat")).readlines()
        assert len(tot) > 200


@pytest.fixture(scope="module")
def ssc_result(tmp_path_factory):
    cfg = load_config("tests/data/electron_photon.toml")
    cfg.do_ssc = True
    cfg.n_pts_inj = 32
    cfg.n_pts_pcut = 48
    cfg.n_pts_pcut_hi = 48
    out = tmp_path_factory.mktemp("ssc")
    return run(cfg, out_dir=str(out))


class TestSSC:
    """Synchrotron self-Compton pass (capability extension: the
    reference only scoped the SSC export, synch_emission.jl:78-105)."""

    def test_ssc_bump_appears(self, ssc_result):
        em = ssc_result.iterations[-1].emission
        assert em.ssc_shell is not None
        ssc_tot = em.ssc_shell.sum(axis=1)
        assert ssc_tot.max() > 1e-90
        # the SSC component peaks well above the synchrotron peak
        # (boosted by ~gamma_e^2)
        synch_tot = em.synch_shell.sum(axis=1)
        e_ssc_peak = em.e_ic[np.argmax(ssc_tot)]
        e_sy_peak = em.e_synch[np.argmax(synch_tot)]
        assert e_ssc_peak > 10.0 * e_sy_peak

    def test_ssc_energy_bounded_by_synchrotron(self, ssc_result):
        """Energy conservation: P_SSC / P_synch = U_ph / U_B < 1 for
        these parameters (photon energy density far below B^2/8pi).
        Both grids share 10 bins/decade, so the dP/dlnE sums compare
        directly as total power."""
        em = ssc_result.iterations[-1].emission
        p_ssc = np.where(em.ssc_shell > 1e-90, em.ssc_shell, 0.0).sum()
        p_sy = np.where(em.synch_shell > 1e-90, em.synch_shell, 0.0).sum()
        assert p_sy > 0
        assert p_ssc < p_sy

    def test_ssc_files_written(self, ssc_result, tmp_path):
        from montecarloscattering_jl_tpu.engine.io import write_photons
        write_photons(ssc_result, str(tmp_path))
        names = os.listdir(tmp_path)
        assert "photon_SSC_grid.dat" in names
        assert "photon_SSC_summed.dat" in names

    def test_ssc_folded_into_total(self, ssc_result):
        em = ssc_result.iterations[-1].emission
        ssc_tot = em.ssc_shell.sum(axis=1)
        j = int(np.argmax(ssc_tot))
        # the master merge at the SSC peak includes at least the SSC
        # contribution
        k = np.argmin(abs(em.e_tot - em.e_ic[j]))
        assert em.tot[k] >= 0.99 * ssc_tot[j]
