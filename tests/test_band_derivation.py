"""Derived megakernel tally band (ops/pallas_step.derive_mega_band)
and the fail-fast oob check.

The per-step tally band must cover the pitch-angle spread of
shock-frame crossing momenta, (1+beta0)/(1-beta0) — two decades at the
reference's gamma0 = 5 (mc_in.toml:19, transformers.jl:440-476) —
which the fixed 2048-cell band could not (STATUS.md round 6).  The
band is derived from the config at StepStatic build time; configs
whose derived band cannot fit VMEM fall back to the XLA engine; a
ladder whose drops exceed tolerance raises at a sync point instead of
after the whole run.
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montecarloscattering_jl_tpu.ops import pallas_step as ps
from montecarloscattering_jl_tpu.ops import step as stp


SLAB = 320          # 2 * (n_theta + 1) at baseline binning
N_CELLS = 55040     # (n_mom + 1) * 2 * (n_theta + 1), baseline


class TestDeriveMegaBand:
    def test_no_scatter_keeps_default(self):
        # scattering off: crossing pitches stay coherent, no angular
        # broadening — the as-shipped gamma0=5 baseline keeps 2048
        assert ps.derive_mega_band(0.98, True, 10, 159, N_CELLS) == 2048

    def test_nonrel_keeps_default(self):
        # beta0 = 0.0167 spreads < half a momentum bin: absorbed by
        # the base (flagship nonlinear throughput must not change)
        assert ps.derive_mega_band(0.0167, False, 10, 159,
                                   N_CELLS) == 2048

    def test_gamma5_covers_angular_spread(self):
        beta0 = math.sqrt(1 - 1 / 25.0)  # gamma0 = 5
        band = ps.derive_mega_band(beta0, False, 10, 159, N_CELLS)
        ang_dec = math.log10((1 + beta0) / (1 - beta0))
        # band must cover the angular spread on top of the base
        assert band >= 2048 + ang_dec * 10 * SLAB - SLAB
        assert band % 128 == 0
        assert band == 8448

    def test_env_override_wins(self, monkeypatch):
        monkeypatch.setenv("MCS_MEGA_BAND", "4096")
        assert ps.derive_mega_band(0.98, False, 10, 159,
                                   N_CELLS) == 4096

    def test_capped_at_full_array(self):
        # tiny PSD: band cannot exceed the padded full array
        assert ps.derive_mega_band(0.999, False, 10, 7, 1000) == 1024


class TestTallyGeometry:
    def test_wide_band_keeps_full_window(self):
        # the tiled band contraction makes VMEM nearly
        # band-independent: the budget constrains window + one
        # _TILE-row scratch, so the gamma0=5 band keeps the full
        # 16,384-row window (51 momentum bins of coverage)
        band, acc, full = ps._tally_geom(N_CELLS, 8448)
        assert (band, full) == (8448, 55040)
        assert acc == 16384
        assert acc + min(band, ps._TILE) <= ps._tally_rows_budget()
        assert acc >= band

    def test_default_band_keeps_full_window(self):
        band, acc, full = ps._tally_geom(N_CELLS)
        assert (band, acc) == (2048, 16384)

    def test_supported_falls_back_on_oversized_band(self):
        # a band that cannot fit the row budget even with the window
        # collapsed onto it (band + one tile of scratch > budget):
        # megakernel_supported must say no (XLA fallback)
        ss = stp.StepStatic(
            eta_mfp=1.0, xn_per_coarse=50.0, xn_per_fine=2000.0,
            dont_scatter=False, dont_dsa=False, do_rad_losses=False,
            do_retro=False, do_tcuts=False, use_custom_eps_b=False,
            is_electron=False, do_energy_transfer=False,
            electron_weight_fac=1.0, n_xspec=0, i_grid_feb=1,
            i_shock=10, nb=64, psd_mom_min=1e-14, bins_per_dec_mom=10,
            n_mom=171, cos_fine=0.969, dcos=1.0 / 80, theta_min=1e-4,
            bins_per_dec_theta=10, n_theta=159,
            mega_band=ps._tally_rows_budget() - ps._TILE + 128)
        assert not ps.megakernel_supported(ss, jnp.float32, jnp.float32)
        import dataclasses
        ok = dataclasses.replace(ss, mega_band=8448)
        assert ps.megakernel_supported(ok, jnp.float32, jnp.float32)


class TestFailFast:
    def test_check_oob_names_segment(self):
        oob = np.asarray([100.0, 1.0, 1.0])
        with pytest.raises(RuntimeError, match="segment 3"):
            ps.check_oob(oob, N_CELLS, band=2048, seg=3)

    def test_ladder_checks_at_sync_points(self, monkeypatch):
        """drive_ladder_async must call check at every sync point so
        an overflow raises within MCS_HYBRID_SYNC_EVERY segments."""
        monkeypatch.setenv("MCS_HYBRID_SYNC_EVERY", "2")
        calls = []

        def dispatch(i):
            return jnp.asarray(1, jnp.int32), jnp.asarray(10, jnp.int32)

        def check(i):
            calls.append(i)
            if i >= 3:
                raise RuntimeError(f"overflow by segment {i}")

        with pytest.raises(RuntimeError, match="segment 3"):
            ps.drive_ladder_async(dispatch, 16, check=check)
        assert calls == [1, 3]   # sync points, not every segment

    def test_dead_chain_still_checked_then_breaks(self, monkeypatch):
        monkeypatch.setenv("MCS_HYBRID_SYNC_EVERY", "2")
        calls = []

        def dispatch(i):
            return jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)

        n_new, _ = ps.drive_ladder_async(
            dispatch, 8, check=calls.append)
        assert calls == [1]      # checked once, then early-broke
        assert (n_new == 0).all()


@pytest.mark.slow
class TestNarrowBandRaisesEarly:
    def test_interpret_ladder_raises_with_segment(self, monkeypatch):
        """A deliberately-narrow band on a scattering config must
        raise at a ladder sync point, naming the segment (VERDICT r3
        item 7), not after the whole species."""
        import __graft_entry__ as ge
        from montecarloscattering_jl_tpu.ops.finish import EscapeTallies

        monkeypatch.setenv("MCS_HYBRID_SYNC_EVERY", "1")
        setup, state, tal, grids, sc, ss = ge._build(
            batch=512, p_dtype=jnp.float32)
        n_seg = 6
        pcut0 = float(sc.pcut)
        pcuts = np.asarray([pcut0 * 2.0 ** i for i in range(n_seg)])
        prevs = np.concatenate([[0.0], pcuts[:-1]])
        targets = np.full(n_seg, 512)
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            jax.random.key(3), jnp.arange(1, n_seg + 1,
                                          dtype=jnp.uint32))
        esc = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)
        with pytest.raises(RuntimeError, match="by segment"):
            ps.run_ion_mega_hybrid(
                state, tal, esc, grids, sc, ss,
                pcuts, prevs, targets, keys,
                band=128, n_steps=256, interpret=True)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
