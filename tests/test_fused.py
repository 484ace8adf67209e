"""Fused pcut ladder (ops/fused_ion.py) vs the host splitting loop.

Both paths key lane RNG identically — fold_in(fold_in(ion_key,
i_pcut + 1), lane) — and both lay the split population out interleaved
(lane j replays saved lane j // i_mult with weight / i_mult, matching
new_pcut, cuts.jl:34-98), so a whole nonlinear run must agree to
float rounding: the only difference is the host path re-deriving
pperp from (ptot, pb) between segments.
"""

import numpy as np
import pytest

from montecarloscattering_jl_tpu.engine import run
from montecarloscattering_jl_tpu.utils import load_config


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    def go(fused, tag):
        cfg = load_config("tests/data/dsa_nonrel.toml")
        cfg.n_itrs = 1
        cfg.n_pts_inj = 40
        cfg.n_pts_pcut = 60
        cfg.n_pts_pcut_hi = 60
        out = tmp_path_factory.mktemp(tag)
        return run(cfg, out_dir=str(out), fused=fused)

    return go(True, "fused"), go(False, "host")


class TestFusedEquivalence:
    def test_trajectory_and_push_counts_match(self, pair):
        f, h = pair
        assert f.n_trajectories == h.n_trajectories
        assert f.n_pushes == h.n_pushes

    def test_spectra_match(self, pair):
        f, h = pair
        a = f.iterations[-1].ion_finals[0].dndp_cr
        b = h.iterations[-1].ion_finals[0].dndp_cr
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=0)

    def test_profile_match(self, pair):
        f, h = pair
        np.testing.assert_allclose(
            f.iterations[-1].profile_after.ux_sk,
            h.iterations[-1].profile_after.ux_sk, rtol=1e-6)

    def test_escapes_match(self, pair):
        f, h = pair
        fe = f.iterations[-1].ion_finals[0]
        he = h.iterations[-1].ion_finals[0]
        np.testing.assert_allclose(fe.esc.esc_flux, he.esc.esc_flux,
                                   rtol=1e-6)
        np.testing.assert_allclose(fe.esc.esc_psd_up.sum(),
                                   he.esc.esc_psd_up.sum(), rtol=1e-6)
