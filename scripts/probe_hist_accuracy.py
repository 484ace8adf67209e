"""Accuracy triage: f32-scatter and f32-Pallas PSD tallies vs an f64
ground truth over a real 256-step transport window.

Answers "which f32 branch is closer to the exact tally" — the
pallas-vs-scatter rel err reported by bench_hist_kernel.py conflates
both branches' f32 accumulation error.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
_cache = os.path.expanduser("~/.cache/mcs_xla")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
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

    rng = np.random.default_rng(0)
    pop = init_pop(rng, cfg.species, 0, 1, cfg.energy_inj, True,
                   cfg.n_pts_inj, setup.x_grid_start, cfg.rg0, 1.0,
                   True, -1.0, cfg.beta0, cfg.gamma0, cfg.u0,
                   setup.x_grid_rg, prof.ux_sk, prof.gamma_sf)

    def fresh(batch):
        reps = batch // len(pop.ptot_pf) + 1
        t = lambda a: np.tile(a, reps)[:batch]
        return stt.init_state(
            t(pop.weight), t(pop.ptot_pf), t(pop.pb_pf), t(pop.x_cm),
            t(pop.i_grid).astype(np.int32), t(prof.ux_sk[pop.i_grid]),
            cfg.xn_per_fine, setup.x_grid_stop, jax.random.key(1),
            p_dtype=jnp.float32)

    def run(band, psd_dtype):
        ss_use = dataclasses.replace(ss, hist_band=band)
        tal = stt.make_tallies(setup.nb, setup.bins.n_mom,
                               setup.bins.n_theta, 0, 0, psd_dtype,
                               batch=BATCH, chunk=8, p_dtype=jnp.float32)

        def steps(state, t):
            def body(i, c):
                s, tl = c
                return stp.helix_step(s, tl, grids, sc, ss_use)
            state, t = jax.lax.fori_loop(0, N_STEPS, body, (state, t))
            return state, stp._flush_records(t, ss_use)

        out = jax.jit(steps, donate_argnums=(0, 1))(fresh(BATCH), tal)
        jax.block_until_ready(out)
        return stt.finalize_tallies(out[1])

    ref = run(0, jnp.float64)
    sc32 = run(0, jnp.float32)
    pl32 = run(ss.hist_band, jnp.float32)

    for name, fin in [("scatter f32", sc32), ("pallas  f32", pl32)]:
        for field in ("psd", "therm_psd"):
            a = np.asarray(getattr(ref, field), np.float64)
            b = np.asarray(getattr(fin, field), np.float64)
            scale = max(np.abs(a).max(), 1e-300)
            err = np.abs(a - b).max() / scale
            # error restricted to cells that matter (>1e-6 of max)
            sig = np.abs(a) > 1e-6 * scale
            rel = (np.abs(a - b)[sig] / np.abs(a)[sig]).max() if sig.any() else 0
            print(f"{name} {field:10s}: max|d|/max={err:.2e}  "
                  f"max rel (sig cells)={rel:.2e}")


if __name__ == "__main__":
    main()
