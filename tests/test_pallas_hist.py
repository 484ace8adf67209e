"""Pallas band-matmul PSD histogram (ops/pallas_hist.py).

Validates, in interpret mode on the CPU mesh, the MXU histogram that
replaces the per-record scatter on TPU (the reference's per-crossing
``psd[i_pt,jθ,i] += w·|1/vx|`` tally, all_flux.jl:234-236, in
difference-array form):

  * band branch vs an f64 numpy reference (compensated-bf16 tolerance),
  * overflow fallback to the exact scatter when cells exceed the band,
  * the all-padding (w == 0) window,
  * backend gating of hist_band_for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarloscattering_jl_tpu.ops import pallas_hist as ph

N_CELLS = 300
NZC = 50
BAND = 256


def _numpy_ref(psd, cell, lo, hi, w):
    out = np.asarray(psd, np.float64).copy()
    flat = out.reshape(-1)
    base = np.asarray(cell, np.int64) * NZC
    np.add.at(flat, base + np.asarray(lo), np.asarray(w, np.float64))
    np.add.at(flat, base + np.asarray(hi) + 1, -np.asarray(w, np.float64))
    return out


def _records(r, rng, cell_lo, cell_hi, rate=0.3, max_span=3):
    cell = rng.integers(cell_lo, cell_hi, r).astype(np.int32)
    lo = rng.integers(0, NZC - max_span - 1, r).astype(np.int32)
    hi = lo + rng.integers(0, max_span, r).astype(np.int32)
    w = (rng.random(r, np.float32) + 0.1) * (
        rng.random(r) < rate).astype(np.float32)
    return cell, lo, hi, w


def _tol(mode):
    # "comp" is deterministic to ~bf16^2; "sr" adds unbiased dither
    # noise ~2e-3*w per record, a handful of records per cell here
    return 2e-5 if mode == "comp" else 2e-2


@pytest.mark.parametrize("mode", ["sr", "comp"])
class TestPsdAccumulate:
    def _run(self, cell, lo, hi, w, mode, psd0=None, seed=0):
        psd = (jnp.zeros((N_CELLS, NZC), jnp.float32)
               if psd0 is None else jnp.asarray(psd0, jnp.float32))
        return ph.psd_accumulate(
            psd, jnp.asarray(cell), jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(w), BAND, seed=jnp.int32(seed), mode=mode,
            interpret=True)

    def test_band_branch_matches_reference(self, mode):
        rng = np.random.default_rng(0)
        # cells inside one BAND-wide window -> Pallas branch
        cell, lo, hi, w = _records(4096, rng, 30, 30 + BAND - 1)
        got = np.asarray(self._run(cell, lo, hi, w, mode), np.float64)
        want = _numpy_ref(np.zeros((N_CELLS, NZC)), cell, lo, hi, w)
        scale = np.abs(want).max()
        assert scale > 0
        np.testing.assert_allclose(got, want, atol=_tol(mode) * scale)
        # rows outside the band window stayed exactly zero
        assert got[:30].sum() == 0.0

    def test_accumulates_into_existing(self, mode):
        rng = np.random.default_rng(1)
        cell, lo, hi, w = _records(4096, rng, 10, 90)
        psd0 = rng.random((N_CELLS, NZC)).astype(np.float32)
        got = np.asarray(self._run(cell, lo, hi, w, mode, psd0),
                         np.float64)
        want = _numpy_ref(psd0, cell, lo, hi, w)
        np.testing.assert_allclose(got, want,
                                   atol=_tol(mode) * np.abs(want).max())

    def test_row_padding(self, mode):
        # R not a multiple of the kernel's row unit -> padded internally
        rng = np.random.default_rng(2)
        cell, lo, hi, w = _records(4096 + 257, rng, 0, BAND - 1)
        got = np.asarray(self._run(cell, lo, hi, w, mode), np.float64)
        want = _numpy_ref(np.zeros((N_CELLS, NZC)), cell, lo, hi, w)
        np.testing.assert_allclose(got, want,
                                   atol=_tol(mode) * np.abs(want).max())

    def test_overflow_falls_back_to_exact_scatter(self, mode):
        rng = np.random.default_rng(3)
        # span the full cell space: wider than BAND -> scatter branch
        cell, lo, hi, w = _records(4096, rng, 0, N_CELLS)
        assert cell.max() - cell.min() >= BAND
        got = np.asarray(self._run(cell, lo, hi, w, mode), np.float64)
        want = _numpy_ref(np.zeros((N_CELLS, NZC)), cell, lo, hi, w)
        # scatter branch is exact f32: tight tolerance in both modes
        np.testing.assert_allclose(got, want, rtol=2e-6,
                                   atol=1e-6 * np.abs(want).max())

    def test_bf16_rounding_handled(self, mode):
        # w = 1.001 is NOT bf16-representable: a naive single-bf16
        # tally yields exactly 4096.0 here (1.001 truncates AND
        # rounds-to-nearest to 1.0).  "comp" must recover the exact
        # sum via the bit-mask split (guards against XLA's
        # allow-excess-precision rule folding the correction to
        # zero); "sr" must land within dither noise of the exact sum
        # (std = ulp*sqrt(r*p*(1-p)) ~ 0.17, use 6 sigma), proving
        # the rounding is unbiased rather than truncating.
        r = 4096
        cell = np.full(r, 5, np.int32)
        z3 = np.full(r, 3, np.int32)
        w = np.full(r, 1.001, np.float32)
        got = float(np.asarray(self._run(cell, z3, z3, w, mode))[5, 3])
        tol = 0.05 if mode == "comp" else 1.0
        assert abs(got - r * 1.001) < tol, got

    def test_all_padding_window(self, mode):
        cell = np.zeros(4096, np.int32)
        z = np.zeros(4096, np.int32)
        w = np.zeros(4096, np.float32)
        got = np.asarray(self._run(cell, z, z, w, mode))
        assert (got == 0).all()

    def test_zero_weight_rows_with_wild_cells_do_not_leak(self, mode):
        rng = np.random.default_rng(4)
        cell, lo, hi, w = _records(4096, rng, 44, N_CELLS)
        # poison non-crossing rows with out-of-window cells
        cell = np.where(w == 0, np.int32(0), cell)
        got = np.asarray(self._run(cell, lo, hi, w, mode), np.float64)
        want = _numpy_ref(np.zeros((N_CELLS, NZC)), cell, lo, hi, w)
        np.testing.assert_allclose(got, want,
                                   atol=_tol(mode) * np.abs(want).max())

    def test_sparse_window(self, mode):
        # low crossing rate (the production regime, mean 0.17)
        rng = np.random.default_rng(6)
        cell, lo, hi, w = _records(2 * 4096, rng, 30, 30 + BAND - 1,
                                   rate=0.08)
        got = np.asarray(self._run(cell, lo, hi, w, mode), np.float64)
        want = _numpy_ref(np.zeros((N_CELLS, NZC)), cell, lo, hi, w)
        np.testing.assert_allclose(got, want,
                                   atol=_tol(mode) * np.abs(want).max())

    def test_wide_zone_spans(self, mode):
        # multi-zone hops: span up to the full zone axis
        rng = np.random.default_rng(7)
        cell, lo, hi, w = _records(4096, rng, 0, BAND - 1, rate=0.08,
                                   max_span=NZC - 2)
        got = np.asarray(self._run(cell, lo, hi, w, mode), np.float64)
        want = _numpy_ref(np.zeros((N_CELLS, NZC)), cell, lo, hi, w)
        np.testing.assert_allclose(got, want,
                                   atol=_tol(mode) * np.abs(want).max())

    def test_mixed_density_programs(self, mode):
        # program 0 dense, program 1 sparse: both contribute correctly
        rng = np.random.default_rng(8)
        c1, l1, h1, w1 = _records(4096, rng, 10, 10 + BAND - 1, rate=0.9)
        c2, l2, h2, w2 = _records(4096, rng, 10, 10 + BAND - 1, rate=0.05)
        cell = np.concatenate([c1, c2])
        lo = np.concatenate([l1, l2])
        hi = np.concatenate([h1, h2])
        w = np.concatenate([w1, w2])
        got = np.asarray(self._run(cell, lo, hi, w, mode), np.float64)
        want = _numpy_ref(np.zeros((N_CELLS, NZC)), cell, lo, hi, w)
        np.testing.assert_allclose(got, want,
                                   atol=_tol(mode) * np.abs(want).max())

    def test_sr_seed_decorrelates_but_preserves_mean(self, mode):
        if mode != "sr":
            pytest.skip("sr-only property")
        r = 4096
        cell = np.full(r, 5, np.int32)
        z3 = np.full(r, 3, np.int32)
        w = np.full(r, 1.001, np.float32)
        vals = [float(np.asarray(
            self._run(cell, z3, z3, w, mode, seed=s))[5, 3])
            for s in (1, 2, 3)]
        # different seeds -> different dither realizations ...
        assert len({round(v, 6) for v in vals}) > 1, vals
        # ... all unbiased around the exact sum
        for v in vals:
            assert abs(v - r * 1.001) < 1.0, vals


class TestGating:
    def test_hist_band_disabled_off_tpu(self):
        # the CPU-mesh suite must never select the Pallas path
        if jax.default_backend() != "tpu":
            assert ph.hist_band_for(4428, 102, jnp.float32) == 0

    def test_hist_band_zero_for_wide_grids_or_f64(self):
        if jax.default_backend() == "tpu":  # pragma: no cover
            assert ph.hist_band_for(4428, 200, jnp.float32) == 0
            assert ph.hist_band_for(4428, 102, jnp.float64) == 0


class TestFlushLayout:
    """The (ip, kind, jt) flat layout round-trips through
    _flush_records + finalize_tallies."""

    def test_flush_and_finalize(self):
        from montecarloscattering_jl_tpu.ops import state as stt
        from montecarloscattering_jl_tpu.ops import step as stp

        nb, n_mom, n_theta = 7, 5, 3
        nzc = nb + 1
        b = 16
        ss = stp.StepStatic(
            eta_mfp=1.0, xn_per_coarse=50.0, xn_per_fine=100.0,
            dont_scatter=False, dont_dsa=False, do_rad_losses=False,
            do_retro=False, do_tcuts=False, use_custom_eps_b=False,
            is_electron=False, do_energy_transfer=False,
            electron_weight_fac=0.0, n_xspec=0, i_grid_feb=0,
            i_shock=3, nb=nb, psd_mom_min=1e-22, bins_per_dec_mom=10,
            n_mom=n_mom, cos_fine=0.5, dcos=0.01, theta_min=1e-4,
            bins_per_dec_theta=10, n_theta=n_theta)
        tal = stt.make_tallies(nb, n_mom, n_theta, 0, 0, jnp.float32,
                               batch=b, chunk=1)
        rng = np.random.default_rng(5)
        ip = rng.integers(0, n_mom + 1, b)
        kind = rng.integers(0, 2, b)
        jt = rng.integers(0, n_theta + 1, b)
        cell = (ip * 2 + kind) * (n_theta + 1) + jt
        lo = rng.integers(0, nb - 2, b)
        hi = lo + rng.integers(0, 2, b)
        w = rng.random(b, np.float32)
        rec = np.zeros((1, 8, b), np.float64)
        rec[0, 4] = w
        rec[0, 5] = lo
        rec[0, 6] = hi
        rec[0, 7] = cell
        tal = tal._replace(rec=jnp.asarray(rec))
        fin = stt.finalize_tallies(stp._flush_records(tal, ss))

        want = np.zeros((2, n_mom + 1, n_theta + 1, nzc))
        for i in range(b):
            want[kind[i], ip[i], jt[i], lo[i]] += w[i]
            want[kind[i], ip[i], jt[i], hi[i] + 1] -= w[i]
        want = np.cumsum(want, axis=-1)[..., :-1]
        np.testing.assert_allclose(np.asarray(fin.psd), want[0],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fin.therm_psd), want[1],
                                   rtol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
