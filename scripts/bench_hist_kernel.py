"""On-chip check of the integrated Pallas histogram: fixed-window
kernel rate and tally equivalence, Pallas vs scatter flush.

Usage: python scripts/bench_hist_kernel.py [batch] [n_steps]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
_cache = os.path.expanduser("~/.cache/mcs_xla")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def main() -> None:
    from montecarloscattering_jl_tpu.engine.run import TransportEngine
    from montecarloscattering_jl_tpu.engine.setup import build_setup
    from montecarloscattering_jl_tpu.models.injection import init_pop
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops import step as stp
    from montecarloscattering_jl_tpu.utils import load_config

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "tests", "data", "dsa_nonrel.toml"))
    setup = build_setup(cfg)
    eng = TransportEngine(setup, p_dtype=jnp.float32)
    prof = setup.profile
    grids = eng.segment_grids(prof)
    sc = eng.segment_scalars(0, 2, prof.bmag2)
    ss = eng.step_static(0)
    print(f"hist_band selected by engine: {ss.hist_band}")

    rng = np.random.default_rng(0)
    pop = init_pop(rng, cfg.species, 0, 1, cfg.energy_inj, True,
                   cfg.n_pts_inj, setup.x_grid_start, cfg.rg0, 1.0,
                   True, -1.0, cfg.beta0, cfg.gamma0, cfg.u0,
                   setup.x_grid_rg, prof.ux_sk, prof.gamma_sf)

    def fresh(seed, batch):
        reps = batch // len(pop.ptot_pf) + 1
        t = lambda a: np.tile(a, reps)[:batch]
        return stt.init_state(
            t(pop.weight), t(pop.ptot_pf), t(pop.pb_pf), t(pop.x_cm),
            t(pop.i_grid).astype(np.int32), t(prof.ux_sk[pop.i_grid]),
            cfg.xn_per_fine, setup.x_grid_stop, jax.random.key(seed),
            p_dtype=jnp.float32)

    def fresh_tal(batch):
        return stt.make_tallies(setup.nb, setup.bins.n_mom,
                                setup.bins.n_theta, 0, 0, jnp.float32,
                                batch=batch, chunk=8,
                                p_dtype=jnp.float32)

    def run(ss_use):
        def steps(state, tal):
            def body(i, c):
                s, tl = c
                return stp.helix_step(s, tl, grids, sc, ss_use)
            state, tal = jax.lax.fori_loop(0, N_STEPS, body, (state, tal))
            tal = stp._flush_records(tal, ss_use)
            return state, tal
        stepsj = jax.jit(steps, donate_argnums=(0, 1))
        out = stepsj(fresh(0, BATCH), fresh_tal(BATCH))
        jax.block_until_ready(out)
        best, fin = np.inf, None
        for i in range(3):
            s_in, t_in = fresh(1, BATCH), fresh_tal(BATCH)
            jax.block_until_ready((s_in, t_in))
            t0 = time.perf_counter()
            s_out, t_out = stepsj(s_in, t_in)
            jax.block_until_ready(t_out.psd_diff)
            dt = time.perf_counter() - t0
            if dt < best:
                best = dt
                fin = (s_out, t_out)
        pushes = int(np.asarray(fin[0].nsteps, np.int64).sum())
        return best, pushes, stt.finalize_tallies(fin[1])

    variants = {}
    for name, band in [("scatter", 0), ("pallas", ss.hist_band)]:
        if band == 0 and name == "pallas":
            print("engine did not select pallas; forcing default band")
        ss_use = dataclasses.replace(ss, hist_band=band)
        dt, pushes, fin = run(ss_use)
        rate = pushes / dt
        print(f"{name:10s} band={band:5d}  {dt * 1e3:8.1f} ms  "
              f"{rate / 1e6:7.2f} M pushes/s", flush=True)
        variants[name] = fin

    a = np.asarray(variants["scatter"].psd, np.float64)
    b = np.asarray(variants["pallas"].psd, np.float64)
    at = np.asarray(variants["scatter"].therm_psd, np.float64)
    bt = np.asarray(variants["pallas"].therm_psd, np.float64)
    scale = max(np.abs(at).max(), np.abs(a).max(), 1e-300)
    err = max(np.abs(a - b).max(), np.abs(at - bt).max()) / scale
    print(f"psd pallas-vs-scatter max rel err: {err:.2e}")
    fa = np.asarray(variants["scatter"].pxx_flux)
    fb = np.asarray(variants["pallas"].pxx_flux)
    print(f"flux identical: {np.array_equal(fa, fb)}")


if __name__ == "__main__":
    main()
