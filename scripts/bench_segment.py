"""Measure transport-segment throughput (pushes/sec) at various batch
sizes on the current JAX backend."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("BENCH_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from montecarloscattering_jl_tpu.utils import load_config
from montecarloscattering_jl_tpu.engine.setup import build_setup
from montecarloscattering_jl_tpu.engine.run import TransportEngine
from montecarloscattering_jl_tpu.ops import state as stt, step as stp
from montecarloscattering_jl_tpu.models.injection import init_pop


def bench(batch=4096, n_steps=512, p_dtype=jnp.float64, repeat=3):
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "tests", "data", "dsa_nonrel.toml"))
    setup = build_setup(cfg)
    eng = TransportEngine(setup, p_dtype=p_dtype)
    eng.batch_size = batch
    prof = setup.profile
    grids = eng.segment_grids(prof)
    sc = eng.segment_scalars(0, 2, prof.bmag2)
    ss = eng.step_static(0)

    rng = np.random.default_rng(0)
    pop = init_pop(rng, cfg.species, 0, 1, cfg.energy_inj, True,
                   cfg.n_pts_inj, setup.x_grid_start, cfg.rg0, 1.0,
                   True, -1.0, cfg.beta0, cfg.gamma0, cfg.u0,
                   setup.x_grid_rg, prof.ux_sk, prof.gamma_sf)
    # tile injected population up to the batch
    reps = batch // len(pop.ptot_pf) + 1
    t = lambda a: np.tile(a, reps)[:batch]
    state = stt.init_state(t(pop.weight), t(pop.ptot_pf), t(pop.pb_pf),
                           t(pop.x_cm), t(pop.i_grid).astype(np.int32),
                           t(prof.ux_sk[pop.i_grid]), cfg.xn_per_fine,
                           setup.x_grid_stop, jax.random.key(0),
                           p_dtype=p_dtype)
    tal = stt.make_tallies(setup.nb, setup.bins.n_mom, setup.bins.n_theta,
                           0, 0, jnp.float32, batch=batch, chunk=8,
                           p_dtype=p_dtype)

    # fixed-step loop for timing (no early exit)
    def steps(state, tal):
        def body(i, c):
            s, t = c
            return stp.helix_step(s, t, grids, sc, ss)
        return jax.lax.fori_loop(0, n_steps, body, (state, tal))
    stepsj = jax.jit(steps, donate_argnums=(0, 1))

    s2, t2 = stepsj(state, tal)   # compile + run
    jax.block_until_ready(s2)
    best = np.inf
    for _ in range(repeat):
        s_in = stt.init_state(t(pop.weight), t(pop.ptot_pf), t(pop.pb_pf),
                              t(pop.x_cm), t(pop.i_grid).astype(np.int32),
                              t(prof.ux_sk[pop.i_grid]), cfg.xn_per_fine,
                              setup.x_grid_stop, jax.random.key(1),
                              p_dtype=p_dtype)
        tal_in = stt.make_tallies(setup.nb, setup.bins.n_mom,
                                  setup.bins.n_theta, 0, 0, jnp.float32,
                                  batch=batch, chunk=8, p_dtype=p_dtype)
        t0 = time.time()
        s2, t2 = stepsj(s_in, tal_in)
        jax.block_until_ready(s2)
        best = min(best, time.time() - t0)
    pushes = batch * n_steps
    return pushes / best


if __name__ == "__main__":
    dt = jnp.float32 if "--f32" in sys.argv else jnp.float64
    for b in (2048, 8192, 32768):
        r = bench(batch=b, p_dtype=dt)
        print(f"batch={b:6d} dtype={dt.__name__}: {r/1e6:8.2f} M pushes/s "
              f"on {jax.devices()[0].platform}")
