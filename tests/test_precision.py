"""Mixed-precision path: the float32 momentum kernel must reproduce the
float64 physics (positions/times stay float64 in both)."""

import jax.numpy as jnp
import numpy as np
import pytest

from montecarloscattering_jl_tpu.engine.run import TransportEngine
from montecarloscattering_jl_tpu.engine.setup import build_setup
from montecarloscattering_jl_tpu.utils import constants as K
from montecarloscattering_jl_tpu.utils import load_config


class TestF32Path:
    def test_dsa_power_law_f32(self):
        """The f32 kernel gives the same DSA power law as f64 within
        MC tolerance (trajectories diverge chaotically; the spectrum
        is the invariant)."""
        cfg = load_config("tests/data/dsa_nonrel.toml")
        cfg.n_pts_inj = 100
        cfg.n_pts_pcut = 150
        cfg.n_pts_pcut_hi = 150
        setup = build_setup(cfg)
        slopes = {}
        for name, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
            eng = TransportEngine(setup, p_dtype=dt)
            it = eng.new_iteration_tallies()
            res = eng.run_ion(0, 0, setup.profile, it)
            p_cent = setup.bins.mom_centers
            dp = np.diff(setup.bins.mom_edges)
            dndp = res.psd[:, :, 75].sum(axis=1) / dp
            sel = ((p_cent > 0.018 * K.MP_C) & (p_cent < 0.12 * K.MP_C)
                   & (dndp > 0))
            slopes[name] = np.polyfit(np.log10(p_cent[sel]),
                                      np.log10(dndp[sel]), 1)[0]
            # flux conservation unaffected by precision
            pxx_norm = it.pxx_flux[60:64] / setup.f_px_upstream
            assert np.all(pxx_norm > 0.8), name
        assert slopes["f32"] == pytest.approx(slopes["f64"], abs=0.4)

    def test_f32_state_dtypes_stable(self):
        """One helix step keeps the f32 carry dtypes (no silent
        upcasts that would break the while_loop)."""
        from montecarloscattering_jl_tpu.models.injection import init_pop
        from montecarloscattering_jl_tpu.ops import state as stt
        from montecarloscattering_jl_tpu.ops import step as stp
        import jax

        cfg = load_config("tests/data/dsa_nonrel.toml")
        setup = build_setup(cfg)
        eng = TransportEngine(setup, p_dtype=jnp.float32)
        prof = setup.profile
        grids = eng.segment_grids(prof)
        sc = eng.segment_scalars(0, 0, prof.bmag2)
        ss = eng.step_static(0)
        rng = np.random.default_rng(0)
        pop = init_pop(rng, cfg.species, 0, 1, cfg.energy_inj, True, 64,
                       setup.x_grid_start, cfg.rg0, 1.0, True, -1.0,
                       cfg.beta0, cfg.gamma0, cfg.u0, setup.x_grid_rg,
                       prof.ux_sk, prof.gamma_sf)
        state = stt.init_state(pop.weight, pop.ptot_pf, pop.pb_pf,
                               pop.x_cm, pop.i_grid,
                               prof.ux_sk[pop.i_grid], cfg.xn_per_fine,
                               setup.x_grid_stop, jax.random.key(0),
                               p_dtype=jnp.float32)
        tal = stt.make_tallies(setup.nb, setup.bins.n_mom,
                               setup.bins.n_theta, 0, 1,
                               batch=len(pop.ptot_pf), chunk=4,
                               p_dtype=jnp.float32)
        s2, _ = stp.helix_step(state, tal, grids, sc, ss)
        assert s2.pb.dtype == jnp.float32
        assert s2.pperp.dtype == jnp.float32
        assert s2.phi.dtype == jnp.float32
        assert s2.x.dtype == jnp.float64
        assert s2.acctime.dtype == jnp.float64
        assert s2.prp_x.dtype == jnp.float64
