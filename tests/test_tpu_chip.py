"""Real-chip validation tier (pytest -m tpu, MCS_TPU_TESTS=1).

Automates the checks of scripts/validate_megakernel.py so a Mosaic
lowering regression cannot ship green (VERDICT round-3 item 5): one
megakernel drain smoke, the statistical XLA-vs-mega channel
comparison, and a hybrid-ladder smoke.  Compiles are served by the
persistent cache (~/.cache/mcs_xla) after the first round.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

B = 16384


@pytest.fixture(scope="module")
def chip_pair():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops import step as stp

    setup, state, tal, grids, sc, ss = ge._build(batch=B,
                                                 p_dtype=jnp.float32)
    s2, t2 = ps.run_segment_mega(state, tal, grids, sc, ss)
    f2 = stt.finalize_tallies(t2)

    setup, state, tal, grids, sc, ss = ge._build(batch=B,
                                                 p_dtype=jnp.float32)
    s1, t1 = stp.run_segment_jit(state, tal, grids, sc, ss, 2)
    f1 = stt.finalize_tallies(t1)
    return s1, f1, s2, f2


class TestChipMegakernel:
    def test_drained(self, chip_pair):
        _, _, s2, _ = chip_pair
        assert not (np.asarray(s2.status) == 0).any()

    def test_step_totals(self, chip_pair):
        s1, _, s2, _ = chip_pair
        n1 = int(np.asarray(s1.nsteps, np.int64).sum())
        n2 = int(np.asarray(s2.nsteps, np.int64).sum())
        assert abs(n2 / n1 - 1.0) < 0.1, (n1, n2)

    @pytest.mark.parametrize("field,tol", [
        ("psd", 0.15), ("therm_psd", 0.05), ("pxx_flux", 0.15),
        ("energy_flux", 0.15), ("num_crossings", 0.05)])
    def test_tally_channels(self, chip_pair, field, tol):
        _, f1, _, f2 = chip_pair
        a = float(np.asarray(getattr(f1, field), np.float64).sum())
        b = float(np.asarray(getattr(f2, field), np.float64).sum())
        assert a != 0
        assert abs(b / a - 1.0) < tol, (field, a, b)

    def test_spectral_shape(self, chip_pair):
        _, f1, _, f2 = chip_pair
        pa = np.asarray(f1.psd, np.float64).sum(axis=(1, 2))
        pb = np.asarray(f2.psd, np.float64).sum(axis=(1, 2))
        sel = pa > pa.max() * 1e-3
        r = np.log(pb[sel] / pa[sel])
        assert np.abs(r).max() < 0.7, r


class TestChipHybridLadder:
    def test_three_pcut_ladder(self):
        if jax.default_backend() != "tpu":
            pytest.skip("no TPU backend")
        import __graft_entry__ as ge
        from montecarloscattering_jl_tpu.ops import pallas_step as ps
        from montecarloscattering_jl_tpu.ops.finish import EscapeTallies

        setup, state, tal, grids, sc, ss = ge._build(
            batch=B, p_dtype=jnp.float32)
        pcut0 = float(np.asarray(sc.pcut))
        pcuts = np.asarray([pcut0, pcut0 * 3, pcut0 * 9])
        prevs = np.asarray([0.0, pcut0, pcut0 * 3])
        targets = np.full(3, B, np.int64)
        keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            jax.random.key(3), jnp.arange(1, 4, dtype=jnp.uint32))
        esc = EscapeTallies.zeros(setup.bins.n_mom, setup.bins.n_theta)
        st, tl, esc, n_new, nsteps, oob = ps.run_ion_mega_hybrid(
            state, tal, esc, grids, sc, ss, pcuts, prevs, targets, keys)
        assert float(np.asarray(oob)[0]) == 0.0
        n_new = np.asarray(n_new)
        assert n_new[0] > 0, "no lanes reached the first pcut"
        assert int(np.asarray(nsteps, np.uint64).sum()) > 0


class TestChipBaselineWindow:
    def test_baseline_segment_rides_sliding_window(self):
        """Drain one segment of the reference-parity baseline config
        (55,040-cell PSD — over the VMEM cap, so the drive MUST use
        the sliding momentum window) on the real chip: dropped weight
        within tolerance, tallies land in the boost-dominated band."""
        if jax.default_backend() != "tpu":
            pytest.skip("no TPU backend")
        import os

        from montecarloscattering_jl_tpu.engine.run import TransportEngine
        from montecarloscattering_jl_tpu.engine.setup import build_setup
        from montecarloscattering_jl_tpu.models.injection import init_pop
        from montecarloscattering_jl_tpu.ops import pallas_step as ps
        from montecarloscattering_jl_tpu.ops import state as stt
        from montecarloscattering_jl_tpu.utils import load_config

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = load_config(os.path.join(root, "configs", "baseline.toml"))
        cfg.dont_scatter = False
        cfg.dont_dsa = False
        setup = build_setup(cfg)
        eng = TransportEngine(setup, p_dtype=jnp.float32)
        ss = eng.step_static(0)
        n_cells = (setup.bins.n_mom + 1) * 2 * (setup.bins.n_theta + 1)
        _, acc, full = ps._tally_geom(n_cells)
        assert acc < full, "baseline must exercise the window"

        prof = setup.profile
        grids = eng.segment_grids(prof)
        sc = eng.segment_scalars(0, 0, prof.bmag2)
        rng = np.random.default_rng(7)
        pop = init_pop(
            rng, cfg.species, 0, cfg.inp_distr, cfg.energy_inj,
            cfg.inj_weight, 4096, setup.x_grid_start, cfg.rg0,
            cfg.eta_mfp, cfg.do_fast_push, cfg.x_fast_stop_rg,
            cfg.beta0, cfg.gamma0, cfg.u0, setup.x_grid_rg,
            prof.ux_sk, prof.gamma_sf)
        b = 4096
        pad = lambda a, fill=0.0: np.concatenate(
            [np.asarray(a), np.full(b - len(a), fill,
                                    np.asarray(a).dtype)])
        state = stt.init_state(
            pad(pop.weight), pad(pop.ptot_pf), pad(pop.pb_pf),
            pad(pop.x_cm), pad(pop.i_grid).astype(np.int32),
            pad(prof.ux_sk[pop.i_grid]), cfg.xn_per_fine,
            setup.x_grid_stop, jax.random.key(11),
            p_dtype=jnp.float32)
        tal = stt.make_tallies(setup.nb, setup.bins.n_mom,
                               setup.bins.n_theta, len(cfg.x_spec),
                               eng.n_tcut_slots, jnp.float32, batch=b,
                               chunk=eng.tally_chunk,
                               p_dtype=jnp.float32)
        # raises via check_oob inside if dropped weight > tolerance
        s2, t2 = ps.run_segment_mega(state, tal, grids, sc, ss)
        fin = stt.finalize_tallies(t2)
        w_ip = (np.abs(np.asarray(fin.psd)).sum(axis=(1, 2))
                + np.abs(np.asarray(fin.therm_psd)).sum(axis=(1, 2)))
        assert w_ip.sum() > 0
        # boost-dominated support: the bulk must sit decades above the
        # plasma thermal bin (p_sk ~ gamma0 m u0)
        assert int(np.argmax(w_ip)) > setup.bins.n_mom // 4


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-m", "tpu"])
