"""Package hygiene: the Aqua.test_all analogue of the reference's test
suite (test/runtests.jl) — every module imports cleanly, the public
API surface exists, and the pitch-histogram / SSC accessors work."""

import importlib
import pkgutil

import numpy as np
import pytest

import montecarloscattering_jl_tpu as pkg


class TestImports:
    def test_all_modules_import(self):
        failures = []
        for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
            try:
                importlib.import_module(m.name)
            except Exception as e:  # pragma: no cover
                failures.append((m.name, repr(e)))
        assert not failures, failures

    def test_public_api(self):
        from montecarloscattering_jl_tpu.engine import (  # noqa: F401
            RunResult, RunSetup, build_setup, run)
        from montecarloscattering_jl_tpu.parallel import (  # noqa: F401
            make_mesh, sharded_run_segment)
        from montecarloscattering_jl_tpu.utils import (  # noqa: F401
            RunConfig, Species, load_config)
        from montecarloscattering_jl_tpu.models.emission import (  # noqa
            EmissionResult, photon_calcs)


class TestPitchHistograms:
    def test_normalized_per_group(self):
        from montecarloscattering_jl_tpu.models.psd_bins import (
            build_psd_bins)
        from montecarloscattering_jl_tpu.ops.reduce import pitch_histograms
        from montecarloscattering_jl_tpu.utils import constants as K
        from montecarloscattering_jl_tpu.utils.species import Species
        sp = [Species(K.MP_CGS, K.QE_CGS, 1e6, 1.0)]
        bins = build_psd_bins(sp, 1, 0.0, 0.01, 0.0, 0.0, 100 * K.MP_C,
                              2.0, 10, 10, 30, 2)
        rng = np.random.default_rng(0)
        psd = rng.random((bins.n_mom + 1, bins.n_theta + 1, 5))
        cc, hist = pitch_histograms(psd, bins)
        assert cc.shape == (bins.n_theta + 1,)
        sums = hist.sum(axis=1)
        nz = sums > 0
        assert np.allclose(sums[nz], 1.0)

    def test_isotropic_input_flat_in_cos(self):
        """A PSD uniform per unit cosine yields a flat pitch
        distribution (density per cos constant)."""
        from montecarloscattering_jl_tpu.models.psd_bins import (
            build_psd_bins)
        from montecarloscattering_jl_tpu.ops.reduce import pitch_histograms
        from montecarloscattering_jl_tpu.utils import constants as K
        from montecarloscattering_jl_tpu.utils.species import Species
        sp = [Species(K.MP_CGS, K.QE_CGS, 1e6, 1.0)]
        bins = build_psd_bins(sp, 1, 0.0, 0.01, 0.0, 0.0, 100 * K.MP_C,
                              2.0, 10, 10, 30, 2)
        cos_b = bins.cos_bounds()
        dcos = np.abs(np.diff(cos_b))
        psd = np.zeros((bins.n_mom + 1, bins.n_theta + 1, 1))
        psd[5, :, 0] = dcos  # counts proportional to bin width
        cc, hist = pitch_histograms(psd, bins)
        col = hist[0, :, 0]
        nz = col > 0
        # density per cosine is flat
        assert col[nz].std() / col[nz].mean() < 1e-9
