"""Round benchmark: transport-kernel throughput on the local chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: particle pushes/sec/chip on the nonrelativistic DSA workload
(the hot helix step with scattering, transforms, tallies — BASELINE.md
"particle pushes/sec/chip").  The reference publishes no numbers
(BASELINE.json "published": {}); vs_baseline is measured against a
documented estimate of the serial Julia reference at 2e6 pushes/s/core
(a per-particle loop doing the same transforms + RNG + trig per step).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_enable_x64", True)
# persistent XLA cache: the transport kernel compiles once per machine
_cache = os.environ.get("MCS_CACHE_DIR",
                        os.path.expanduser("~/.cache/mcs_xla"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REFERENCE_SERIAL_PUSHES_PER_SEC = 2.0e6   # documented estimate, see above
BATCH = int(os.environ.get("MCS_BENCH_BATCH", 1048576))
N_STEPS = int(os.environ.get("MCS_BENCH_STEPS", 256))
P_DTYPE = (jnp.float32 if os.environ.get("MCS_BENCH_DTYPE", "f32") == "f32"
           else jnp.float64)


def main() -> None:
    from montecarloscattering_jl_tpu.engine.run import TransportEngine
    from montecarloscattering_jl_tpu.engine.setup import build_setup
    from montecarloscattering_jl_tpu.models.injection import init_pop
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops import step as stp
    from montecarloscattering_jl_tpu.utils import load_config

    cfg = load_config(os.path.join(os.path.dirname(__file__), "tests",
                                   "data", "dsa_nonrel.toml"))
    setup = build_setup(cfg)
    eng = TransportEngine(setup, p_dtype=P_DTYPE)
    prof = setup.profile
    grids = eng.segment_grids(prof)
    sc = eng.segment_scalars(0, 2, prof.bmag2)
    ss = eng.step_static(0)

    rng = np.random.default_rng(0)
    pop = init_pop(rng, cfg.species, 0, 1, cfg.energy_inj, True,
                   cfg.n_pts_inj, setup.x_grid_start, cfg.rg0, 1.0,
                   True, -1.0, cfg.beta0, cfg.gamma0, cfg.u0,
                   setup.x_grid_rg, prof.ux_sk, prof.gamma_sf)
    reps = BATCH // len(pop.ptot_pf) + 1
    t = lambda a: np.tile(a, reps)[:BATCH]

    def fresh(seed):
        return stt.init_state(
            t(pop.weight), t(pop.ptot_pf), t(pop.pb_pf), t(pop.x_cm),
            t(pop.i_grid).astype(np.int32), t(prof.ux_sk[pop.i_grid]),
            cfg.xn_per_fine, setup.x_grid_stop, jax.random.key(seed),
            p_dtype=P_DTYPE)

    def fresh_tal():
        return stt.make_tallies(setup.nb, setup.bins.n_mom,
                                setup.bins.n_theta, 0, 0, jnp.float32,
                                batch=BATCH,
                                chunk=int(os.environ.get("MCS_BENCH_CHUNK", 8)),
                                p_dtype=P_DTYPE)

    def steps(state, tal):
        def body(i, c):
            s, tl = c
            return stp.helix_step(s, tl, grids, sc, ss)
        return jax.lax.fori_loop(0, N_STEPS, body, (state, tal))

    stepsj = jax.jit(steps, donate_argnums=(0, 1))
    out = stepsj(fresh(0), fresh_tal())
    jax.block_until_ready(out)           # compile + warm

    best = np.inf
    for i in range(3):
        s_in, t_in = fresh(i + 1), fresh_tal()
        t0 = time.time()
        out = stepsj(s_in, t_in)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)

    value = BATCH * N_STEPS / best
    print(json.dumps({
        "metric": "particle_pushes_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "pushes/s",
        "vs_baseline": round(value / REFERENCE_SERIAL_PUSHES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
