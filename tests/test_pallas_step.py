"""Pallas transport megakernel (ops/pallas_step.py), interpret mode.

The megakernel re-implements ops/step.helix_step inside one Mosaic
kernel with a different (but equally principled) threefry stream, so
validation is STATISTICAL against the XLA path on the same population:
status mix, step totals, and every tally channel must agree within MC
tolerance.  Deterministic sub-pieces (threefry, double-single
arithmetic, packing round-trip) are checked exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montecarloscattering_jl_tpu.ops import pallas_step as ps


class TestPrimitives:
    def test_threefry_matches_jax_reference(self):
        """_threefry2x32 == jax's own Threefry-2x32 PRF."""
        from jax._src.prng import threefry_2x32
        rng = np.random.default_rng(0)
        k = rng.integers(0, 2**32, (2, 64), dtype=np.uint32)
        c = rng.integers(0, 2**32, (2, 64), dtype=np.uint32)
        want = np.asarray(threefry_2x32(
            jnp.asarray(k), jnp.asarray(c))).reshape(2, 64)
        got0, got1 = ps._threefry2x32(
            jnp.asarray(k[0]), jnp.asarray(k[1]),
            jnp.asarray(c[0]), jnp.asarray(c[1]))
        np.testing.assert_array_equal(np.asarray(got0), want[0])
        np.testing.assert_array_equal(np.asarray(got1), want[1])

    def test_ds_add_tracks_f64(self):
        """Double-single accumulation stays within ~2^-45 relative of
        f64 over 10k heterogeneous increments."""
        rng = np.random.default_rng(1)
        incs = (rng.standard_normal(10_000) * 10.0 ** rng.integers(
            -4, 4, 10_000)).astype(np.float32)
        hi = jnp.asarray(np.float32(1.0e8))[None]
        lo = jnp.zeros(1, jnp.float32)
        ref = np.float64(1.0e8)
        for v in incs:
            hi, lo = ps._ds_add(hi, lo, jnp.asarray(v)[None])
            ref += np.float64(v)
        got = float(hi[0]) + float(lo[0])
        assert abs(got - ref) / abs(ref) < 3e-13

    def test_pack_unpack_roundtrip(self):
        import __graft_entry__ as ge
        setup, state, tal, grids, sc, ss = ge._build(
            batch=300, p_dtype=jnp.float32)
        fs, is_, b = ps.pack_state(state)
        assert b == 300
        back = ps.unpack_state(fs, is_, b, state)
        for name in state._fields:
            if name in ("igrid",):   # derived from x by the wrapper
                continue
            if name == "key":
                a = np.asarray(jax.random.key_data(getattr(state, name)))
                bb = np.asarray(jax.random.key_data(getattr(back, name)))
            else:
                a = np.asarray(getattr(state, name))
                bb = np.asarray(getattr(back, name))
            if a.dtype.kind == "f":
                np.testing.assert_allclose(bb, a, rtol=1e-6, atol=0.0,
                                           err_msg=name)
            else:
                np.testing.assert_array_equal(bb, a, err_msg=name)


class TestSupportGate:
    def test_baseline_config_is_megakernel_supported(self):
        """The reference-parity baseline (configs/baseline.toml, the
        key-for-key mirror of /root/reference/mc_in.toml with tcuts ON
        and energy-transfer-frac 0.1) must be inside the megakernel's
        static support set for BOTH species — the flagship workload
        may not be locked out of the fastest engine."""
        import os
        from montecarloscattering_jl_tpu.engine.run import TransportEngine
        from montecarloscattering_jl_tpu.engine.setup import build_setup
        from montecarloscattering_jl_tpu.utils import load_config
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = load_config(os.path.join(root, "configs", "baseline.toml"))
        setup = build_setup(cfg)
        eng = TransportEngine(setup, p_dtype=jnp.float32)
        for i_ion in range(cfg.n_ions):
            ss = eng.step_static(i_ion)
            assert ps.megakernel_supported(ss, jnp.float32, jnp.float32), (
                f"species {i_ion} (aa={cfg.species[i_ion].aa})")


@pytest.mark.slow
class TestAdaptiveTailLaunch:
    """Tail launches (MCS_MEGA_TAIL_MULT-x longer once the live
    population shrinks) must be bitwise-neutral per TRAJECTORY: the
    RNG counter is the per-lane step count carried with the lane, so
    where a launch boundary falls cannot change any lane's physics.
    Tallies are only statistically equal — the stochastic-rounding
    dither is keyed by the lane's CURRENT slot, and the partition
    schedule (hence slot assignment) differs between launch
    lengths."""

    def test_tail_mult_matches_fixed(self, monkeypatch):
        import __graft_entry__ as ge
        from montecarloscattering_jl_tpu.ops import state as stt
        # cap the drain (12 launches x 128 steps at mult=1) so the
        # interpret-mode run stays cheap; the tail branch fires well
        # before the cap (thermal attrition kills most of a 256-lane
        # batch inside the first two launches)
        monkeypatch.setattr(ps, "MAX_HELIX_STEPS", 1536)
        # the launch cache does not key on MAX_HELIX_STEPS: drop any
        # drive compiled by earlier tests with the unpatched cap
        monkeypatch.setattr(ps, "_LAUNCH_CACHE", {})
        setup, state, tal, grids, sc, ss = ge._build(
            batch=256, p_dtype=jnp.float32)
        # small launches so the drain needs several and the tail
        # branch actually fires once attrition bites
        monkeypatch.setenv("MCS_MEGA_TAIL_MULT", "1")
        s1, t1 = ps.run_segment_mega(state, tal, grids, sc, ss,
                                     steps_per_launch=128,
                                     interpret=True)
        monkeypatch.setenv("MCS_MEGA_TAIL_MULT", "4")
        s2, t2 = ps.run_segment_mega(state, tal, grids, sc, ss,
                                     steps_per_launch=128,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(s2.status),
                                      np.asarray(s1.status))
        np.testing.assert_array_equal(np.asarray(s2.nsteps),
                                      np.asarray(s1.nsteps))
        np.testing.assert_allclose(np.asarray(s2.pb),
                                   np.asarray(s1.pb), rtol=0, atol=0)
        f1 = stt.finalize_tallies(t1)
        f2 = stt.finalize_tallies(t2)
        # identical records, slot-keyed bf16 SR dither: totals agree
        # to the dither noise, not bitwise
        assert abs(float(f2.psd.sum()) - float(f1.psd.sum())) <= (
            1e-3 * abs(float(f1.psd.sum())))
        p1 = np.asarray(f1.pxx_flux)
        p2 = np.asarray(f2.pxx_flux)
        np.testing.assert_allclose(p2, p1, rtol=5e-3,
                                   atol=5e-3 * np.abs(p1).max())


@pytest.mark.slow
class TestSlidingWindow:
    """The sliding momentum-window tally path (large-PSD configs) must
    reproduce the full-accumulator path EXACTLY when nothing drops:
    the in-kernel band contraction sees identical window-relative
    cells, so only the scatter offset differs."""

    def test_windowed_drain_matches_full(self, monkeypatch):
        import __graft_entry__ as ge
        from montecarloscattering_jl_tpu.ops import state as stt
        # cap the drain at 6 launches x 256 steps: every launch still
        # re-anchors + scatters the window, interpret mode stays cheap
        monkeypatch.setattr(ps, "MAX_HELIX_STEPS", 1536)
        # the launch cache does not key on MAX_HELIX_STEPS: drop any
        # drive compiled by earlier tests with the unpatched cap
        monkeypatch.setattr(ps, "_LAUNCH_CACHE", {})
        # adaptive tail launches are DISABLED on windowed drives, so
        # pin them off for the full-accumulator run too: otherwise the
        # two paths partition on different launch boundaries and the
        # slot-keyed stochastic-rounding dither differs at the 2^-7
        # level, which is exactly the noise this exact-match test must
        # exclude (launch-length equivalence is TestAdaptiveTailLaunch)
        monkeypatch.setenv("MCS_MEGA_TAIL_MULT", "1")
        # pin one partition schedule for BOTH paths: the periodic
        # momentum re-sort defaults on for windowed drives only, and
        # the stochastic-rounding dither is slot-keyed, so divergent
        # schedules would break this exact match at the bf16 level
        monkeypatch.setenv("MCS_MEGA_RESORT_EVERY", "4")
        setup, state, tal, grids, sc, ss = ge._build(
            batch=256, p_dtype=jnp.float32)
        n_cells = tal.psd_diff.shape[0]
        full_pad = -(-n_cells // 128) * 128
        s1, t1 = ps.run_segment_mega(state, tal, grids, sc, ss,
                                     steps_per_launch=256,
                                     interpret=True)
        # force the window to half the array: the drive must re-anchor
        # per launch and scatter into the full HBM array
        cap = max(128, (full_pad // 2 // 128) * 128)
        monkeypatch.setenv("MCS_MEGA_WINDOW", str(cap))
        # the band is a static-config field (derive_mega_band at
        # engine build): override it there, not via the env
        import dataclasses
        ss_win = dataclasses.replace(ss, mega_band=min(2048, cap))
        s2, t2 = ps.run_segment_mega(state, tal, grids, sc, ss_win,
                                     steps_per_launch=256,
                                     interpret=True)
        f1 = stt.finalize_tallies(t1)
        f2 = stt.finalize_tallies(t2)
        np.testing.assert_allclose(
            np.asarray(f2.psd), np.asarray(f1.psd), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(f2.therm_psd), np.asarray(f1.therm_psd),
            rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(s2.status),
                                      np.asarray(s1.status))


@pytest.mark.slow
class TestWindowAnchorStraggler:
    """Below-window crossing records must not drag the per-step tally
    band anchor (the --dsa oob bug): a record whose cell falls below
    the sliding window is dropped-and-counted REGARDLESS, so letting
    it pull the band's scalar-min anchor to the window bottom sheds
    the whole step's in-window bulk.  Regression: boost a minority of
    lanes 4 decades up so the top-anchored window excludes the thermal
    bulk — the bulk's records drop (counted against the tolerance),
    but the minority's in-window records must match the
    full-accumulator run bin for bin."""

    def test_minority_in_window_records_survive(self, monkeypatch):
        import __graft_entry__ as ge
        from montecarloscattering_jl_tpu.ops import state as stt
        # one launch total: the in-kernel cap finishes every lane at
        # 256 steps, so the window anchors exactly once and the two
        # runs see identical slots (bit-identical SR dither)
        monkeypatch.setattr(ps, "MAX_HELIX_STEPS", 256)
        monkeypatch.setattr(ps, "_LAUNCH_CACHE", {})
        monkeypatch.setenv("MCS_MEGA_TAIL_MULT", "1")
        setup, state, tal, grids, sc, ss = ge._build(
            batch=256, p_dtype=jnp.float32)
        pb = np.asarray(state.pb)
        pp = np.asarray(state.pperp)
        pt = np.hypot(pb, pp)
        # Geometry (graft config: n_mom=53, 10 bins/dec, thermal
        # bulk's SHOCK-frame tallies at bins ~25-37): boost every 8th
        # lane to bin n_mom-9 — inside the grid and the pmax test,
        # tallying at bins 43-44.  A 6-bin window top-anchored at
        # ip(psk_hi)+margin(2) = 46 covers bins [41, 47]: the minority
        # is in-window, the WHOLE bulk (<= 37) is below it.  The 2-bin
        # (256-cell) band covers the minority when anchored on
        # in-window records (worst in-window spread ~245 cells), while
        # the old buggy anchor — dragged to the window bottom by the
        # bulk's below-window records — sheds the minority's bin-44
        # cells (rel 287-327 >= 256) on every coincident step.
        boost_to = float(ss.psd_mom_min) * 10.0 ** (
            (ss.n_mom - 10) / ss.bins_per_dec_mom)
        sel = (np.arange(pb.size) % 8) == 0
        fac = np.where(sel, boost_to / pt, 1.0).astype(pb.dtype)
        state = state._replace(pb=jnp.asarray(pb * fac),
                               pperp=jnp.asarray(pp * fac))

        n_cells = tal.psd_diff.shape[0]
        full_pad = -(-n_cells // 128) * 128
        slab = 2 * (ss.n_theta + 1)
        cap = -(-(6 * slab) // 128) * 128     # 6-bin window
        band = -(-(2 * slab) // 128) * 128    # 2-bin band
        if cap >= full_pad:
            pytest.skip("PSD too small to exercise the window here")

        s1, t1 = ps.run_segment_mega(state, tal, grids, sc, ss,
                                     steps_per_launch=256,
                                     interpret=True)
        f1 = stt.finalize_tallies(t1)
        monkeypatch.setenv("MCS_MEGA_WINDOW", str(cap))
        monkeypatch.setenv("MCS_MEGA_WIN_MARGIN", "2")
        # the dropped thermal bulk dominates |weight|: accept it, the
        # assertion below checks exactly WHAT dropped
        monkeypatch.setenv("MCS_MEGA_OOB_TOL", "0.999")
        # the band is a static-config field now (derive_mega_band at
        # engine build), so override it there, not via the env
        import dataclasses
        ss_narrow = dataclasses.replace(ss, mega_band=band)
        s2, t2 = ps.run_segment_mega(state, tal, grids, sc, ss_narrow,
                                     steps_per_launch=256,
                                     interpret=True)
        f2 = stt.finalize_tallies(t2)

        # identical trajectories (tally config cannot touch the RNG)
        np.testing.assert_array_equal(np.asarray(s2.nsteps),
                                      np.asarray(s1.nsteps))
        hi_cut = ss.n_mom - 13       # >= 2 bins above the bulk's top
        lo_cut = ss.n_mom - 17       # >= 1 bin below the window
        got_minority = False
        for field in ("psd", "therm_psd"):
            a = np.asarray(getattr(f1, field), np.float64)
            b = np.asarray(getattr(f2, field), np.float64)
            # the bug: in-window minority records shed to ~0
            np.testing.assert_allclose(b[hi_cut:], a[hi_cut:],
                                       rtol=1e-6, err_msg=field)
            if a[hi_cut:].sum() > 0.0:
                got_minority = True
            # the thermal bulk really was below the window (test is
            # not vacuous) and really was dropped
            lo1, lo2 = a[:lo_cut].sum(), b[:lo_cut].sum()
            if lo1 > 0.0:
                assert lo2 <= 1e-6 * lo1, (field, lo1, lo2)
        assert got_minority


@pytest.mark.slow
class TestMegaSegmentStatistical:
    """Full drain of the DSA test population: megakernel (interpret)
    vs the XLA run_segment, statistical agreement."""

    @pytest.fixture(scope="class")
    def runs(self):
        import __graft_entry__ as ge
        from montecarloscattering_jl_tpu.ops import state as stt
        from montecarloscattering_jl_tpu.ops import step as stp
        B = 1024
        setup, state, tal, grids, sc, ss = ge._build(
            batch=B, p_dtype=jnp.float32)
        s1, t1 = stp.run_segment(state, tal, grids, sc, ss, 0)
        f1 = stt.finalize_tallies(t1)
        s2, t2 = ps.run_segment_mega(state, tal, grids, sc, ss,
                                     steps_per_launch=512,
                                     interpret=True)
        f2 = stt.finalize_tallies(t2)
        return s1, f1, s2, f2

    def test_all_lanes_drained(self, runs):
        s1, _, s2, _ = runs
        assert not (np.asarray(s2.status) == 0).any()

    def test_status_mix(self, runs):
        s1, _, s2, _ = runs
        c1 = np.bincount(np.asarray(s1.status), minlength=3)
        c2 = np.bincount(np.asarray(s2.status), minlength=3)
        # SAVED counts are small Poisson; FINISHED dominate
        assert abs(c1[2] - c2[2]) < 6 * np.sqrt(max(c1[1], c2[1], 4))

    def test_step_totals(self, runs):
        s1, _, s2, _ = runs
        n1 = int(np.asarray(s1.nsteps, np.int64).sum())
        n2 = int(np.asarray(s2.nsteps, np.int64).sum())
        assert abs(n1 - n2) / n1 < 0.15

    @pytest.mark.parametrize("field", ["psd", "therm_psd", "pxx_flux",
                                       "energy_flux", "num_crossings"])
    def test_tally_totals(self, runs, field):
        _, f1, _, f2 = runs
        a = float(np.asarray(getattr(f1, field), np.float64).sum())
        b = float(np.asarray(getattr(f2, field), np.float64).sum())
        assert a != 0
        # tolerances reflect MC noise at B=1024 with INDEPENDENT RNG
        # streams: the CR psd total is dominated by 1/vx spike-clamped
        # records of the few injected lanes, and the net fluxes sit on
        # large cancellations.  The on-chip 64k-lane comparison pins
        # every channel at the 0.2-3% level (√N-consistent;
        # scripts/validate_megakernel.py).
        tol = {"psd": 0.5, "pxx_flux": 0.5, "energy_flux": 0.5}.get(
            field, 0.15)
        assert abs(b / a - 1.0) < tol, (field, a, b)

    def test_spectrum_shape(self, runs):
        # B=1024 leaves ~20 injected lanes behind the CR spectrum, so
        # per-bin ratios between the two independent streams are
        # heavy-tailed; the on-chip 64k comparison pins the shape at
        # rms 0.054 (scripts/validate_megakernel.py).  Here: same
        # support and no bin off by more than e.
        _, f1, _, f2 = runs
        pa = np.asarray(f1.psd, np.float64).sum(axis=(1, 2))
        pb = np.asarray(f2.psd, np.float64).sum(axis=(1, 2))
        sel = pa > pa.max() * 3e-2
        r = pb[sel] / pa[sel]
        assert np.abs(np.log(r)).max() < 1.0, r


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
