"""Emission kernel tests: closed-form anchors for the synchrotron F(x)
kernel, Kafexhiu cross sections, blackbody photon field, IC kinematics,
Doppler shifting (SURVEY.md section 4)."""

import math

import numpy as np
import pytest

from montecarloscattering_jl_tpu.models.emission import inverse_compton as ic
from montecarloscattering_jl_tpu.models.emission import pion
from montecarloscattering_jl_tpu.models.emission import synchrotron as syn
from montecarloscattering_jl_tpu.models.emission.driver import (
    doppler_shift_to_ism, merge_total)
from montecarloscattering_jl_tpu.utils import constants as K


class TestSynchrotron:
    def test_f_known_values(self):
        """F(x) peak: F(0.2859) ~ 0.9180 (standard tables); small-x
        behavior F(x) ~ 2.15 x^(1/3)."""
        assert float(syn.synchrotron_f(np.array([0.2859]))[0]) == \
            pytest.approx(0.9180, abs=0.003)
        x = 1.0e-4
        assert float(syn.synchrotron_f(np.array([x]))[0]) == \
            pytest.approx(2.1495 * x ** (1.0 / 3.0), rel=0.01)
        # large x decays ~ exp(-x)
        assert float(syn.synchrotron_f(np.array([10.0]))[0]) < 1e-3

    def test_total_power(self):
        """Integrated spectrum of a single electron matches the
        classical synchrotron power P = (4/3) sigma_T c beta^2 gamma^2
        U_B averaged over pitch angles."""
        b = 1.0e-3
        gam = 1.0e4
        p = gam * K.ME_CGS * K.C_CGS
        edges = np.array([p * 0.999, p * 1.001])
        counts = np.array([1.0])
        e_g = syn.photon_energy_grid(1e-13, 250, 10)
        emis = syn.synch_emission(counts, edges, b, e_g)
        # integrate dP/dlnE dlnE
        power = (emis * np.diff(np.log(e_g), prepend=np.log(e_g[0])
                                - (np.log(e_g[1]) - np.log(e_g[0])))).sum()
        u_b = b**2 / (8 * math.pi)
        p_classical = (4.0 / 3.0) * K.SIGMA_T * K.C_CGS * gam**2 * u_b
        # no sin^2(alpha) average in the reference prefactor => expect
        # agreement within tens of percent
        assert power == pytest.approx(p_classical, rel=0.5)
        assert power > 0


class TestPion:
    def test_sigma_below_threshold_zero(self):
        assert np.all(pion.sigma_pi(np.array([0.1, 0.27])) == 0.0)

    def test_sigma_magnitudes(self):
        """Kafexhiu (2014) Fig 2/3 anchor points: sigma_pi ~ few mb at
        Tp ~ 1 GeV, tens of mb at high energy."""
        s = pion.sigma_pi(np.array([0.6, 1.0, 10.0, 1000.0]))
        assert 1.0 < s[1] < 10.0        # ~4 mb near 1 GeV
        assert 10.0 < s[2] < 40.0
        # inclusive (multiplicity-weighted): n_pi0 ~ 5 x sigma_inel
        # ~ 35 mb at 1 TeV
        assert 100.0 < s[3] < 250.0
        assert np.all(np.diff(s[1:]) > 0)

    def test_egmax_kinematics(self):
        """At threshold the max photon energy approaches m_pi/2 x
        doppler factors ~ 0.13 GeV-scale; grows with Tp."""
        egm, amax = pion.amax_and_egmax(np.array([0.3, 1.0, 100.0]),
                                        pion.sigma_pi(np.array([0.3, 1.0,
                                                                100.0])))
        assert egm[0] == pytest.approx(0.13, abs=0.1)
        assert egm[2] > 10.0
        assert np.all(np.diff(egm) > 0)

    def test_f_func_support(self):
        """F is 1 at Eg -> pion peak (X=0) and 0 beyond Eg_max."""
        tp = np.array([10.0])
        sig = pion.sigma_pi(tp)
        egm, _ = pion.amax_and_egmax(tp, sig)
        eg = np.array([pion.E0_PI0_GEV / 2.0, float(egm[0]) * 1.5])
        f = pion.f_func(tp, eg, egm)
        assert f[0, 0] == pytest.approx(1.0, abs=1e-6)
        assert f[0, 1] == 0.0

    def test_emission_positive(self):
        mc = K.MP_C
        edges = np.array([1.0, 1.5, 2.2, 3.3, 5.0]) * 10.0 * mc
        counts = np.array([1.0, 1.0, 1.0, 1.0])
        e_g = 10.0 ** (math.log10(1.0 * K.MEV_ERG)
                       + np.arange(150) / 10.0)
        emis = pion.pion_emission(counts, edges, e_g, 1.0, 1.0, mc,
                                  [1.0], [1.0])
        assert emis.max() > 1e-30
        # peak near ~100 MeV - few GeV for these protons
        peak_e = e_g[np.argmax(emis)] / K.MEV_ERG
        assert 10.0 < peak_e < 1e4


class TestInverseCompton:
    def test_cmb_field_density(self):
        """CMB photon number density ~ 411 /cm^3 at z = 0."""
        e_rm, n_ph = ic.cmb_photon_field(0.0)
        assert n_ph.sum() == pytest.approx(411.0, rel=0.1)
        # mean photon energy ~ 6.3e-4 eV * 2.7 = ~1.1e-15 erg scale
        mean_e = (e_rm * n_ph).sum() / n_ph.sum() * K.ME_C2
        assert mean_e == pytest.approx(6.34e-4 * 1.602e-12 * 2.70,
                                       rel=0.2)

    def test_ic_peak_energy(self):
        """Thomson-regime upscattering: E_out ~ gamma^2 E_cmb.  (gamma
        must be large enough that gamma^2 E_cmb clears the 10 keV IC
        grid floor.)"""
        gam = 1.0e4
        mc = K.ME_CGS * K.C_CGS
        p = gam * mc
        edges = np.array([p * 0.99, p * 1.01])
        # enough electrons that the flux at 1 kpc clears the 1e-55
        # emission floor (inverse_compton.jl:305-307)
        d2n = np.full((1, 5), 1.0e50)
        cosb = np.linspace(-1, 1, 6)
        alpha = ic.ic_photon_energy_grid(1e-2, 140, 10)
        emis = ic.ic_emission(d2n, edges, cosb, alpha, 0.0, 1.0,
                              3.086e24, mc)
        e_peak = alpha[np.argmax(emis)] * K.ME_C2
        e_cmb = 2.7 * K.KB_CGS * K.T_CMB0
        expect = gam**2 * e_cmb
        assert math.log10(e_peak) == pytest.approx(math.log10(expect),
                                                   abs=0.6)


class TestSummation:
    def test_doppler_shift_conserves_photons_at_rest(self):
        e = 10.0 ** (np.arange(50) / 10.0)
        grid = np.zeros((50, 3))
        grid[20, 1] = 5.0
        out = doppler_shift_to_ism(grid, e, np.zeros(3), np.ones(3))
        # gamma=1, beta=0: photons stay in their bin
        assert out[20, 1] == pytest.approx(5.0, rel=1e-9)
        assert out.sum() == pytest.approx(5.0, rel=1e-9)

    def test_doppler_blueshift(self):
        e = 10.0 ** (np.arange(80) / 10.0)
        grid = np.zeros((80, 1))
        grid[30, 0] = 1.0
        beta = np.array([0.9])
        gamma = np.array([1.0 / math.sqrt(1 - 0.81)])
        out = doppler_shift_to_ism(grid, e, beta, gamma)
        # flux-weighted mean energy moves up (beaming toward observer
        # dominates) and total photon count grows by ~gamma^3 * <shift>
        com_in = 30
        com_out = (np.arange(80) * out[:, 0]).sum() / out[:, 0].sum()
        assert com_out != com_in
        assert out.sum() > 0

    def test_merge_total_offsets(self):
        n_p = 130  # pion bins
        n_s = 180
        n_i = 140
        pion_s = np.zeros((n_p, 1)); pion_s[0, 0] = 1.0
        syn_s = np.zeros((n_s, 1)); syn_s[0, 0] = 2.0
        ic_s = np.zeros((n_i, 1)); ic_s[0, 0] = 3.0
        e_tot, tot = merge_total(pion_s, syn_s, ic_s)
        # pion starts at 1 MeV = 130 decades*10 past 1e-13
        assert tot[130, 0] == pytest.approx(1.0)
        assert tot[0, 0] == pytest.approx(2.0)    # synch at 1e-13
        assert tot[110, 0] == pytest.approx(3.0)  # IC at 1e-2
