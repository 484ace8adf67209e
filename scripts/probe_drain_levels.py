"""Per-level timing of the drain ladder: where do the
kernel-window-vs-drain-to-empty pushes/s go?

For each ladder level (window size), reports wall time, lane-steps
executed (sum of nsteps deltas), executed-lane-step rate, and the
occupancy (active fraction) — separating attrition loss (dead lanes
still stepped) from small-window overhead (fixed flush costs).

Usage: python scripts/probe_drain_levels.py [batch] [levels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    os.environ.get("MCS_CACHE_DIR", "~/.cache/mcs_xla")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
LEVELS = int(sys.argv[2]) if len(sys.argv) > 2 else 9


def main() -> None:
    from montecarloscattering_jl_tpu.engine.run import TransportEngine
    from montecarloscattering_jl_tpu.engine.setup import build_setup
    from montecarloscattering_jl_tpu.models.injection import init_pop
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops import step as stp
    from montecarloscattering_jl_tpu.ops.state import ACTIVE
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
    reps = BATCH // len(pop.ptot_pf) + 1
    t = lambda a: np.tile(a, reps)[:BATCH]
    state = stt.init_state(
        t(pop.weight), t(pop.ptot_pf), t(pop.pb_pf), t(pop.x_cm),
        t(pop.i_grid).astype(np.int32), t(prof.ux_sk[pop.i_grid]),
        cfg.xn_per_fine, setup.x_grid_stop, jax.random.key(1),
        p_dtype=jnp.float32)
    tal = stt.make_tallies(setup.nb, setup.bins.n_mom,
                           setup.bins.n_theta, 0, 0, jnp.float32,
                           batch=BATCH, chunk=8, p_dtype=jnp.float32)

    sizes = [BATCH]
    for _ in range(LEVELS):
        nxt = sizes[-1] // 2
        if nxt < 512 or nxt % 128 != 0:
            break
        sizes.append(nxt)

    def level_loop(win_st, win_tal, nxt):
        def body(carry):
            s, tl = carry
            return stp.helix_step(s, tl, grids, sc, ss)

        def cond(carry):
            s, _ = carry
            a = s.status == ACTIVE
            if nxt is None:
                return jnp.any(a)
            return jnp.any(a) & (jnp.sum(a) > nxt)

        win_st, win_tal = lax.while_loop(cond, body, (win_st, win_tal))
        return win_st, stp._flush_records(win_tal, ss)

    loops = {}
    chunk = tal.rec.shape[0]
    rd = tal.rec.dtype
    full = state
    tallies = tal
    total_t0 = time.time()
    print(f"{'size':>8} {'wall ms':>9} {'lane-steps':>12} "
          f"{'exec M/s':>9} {'occupancy':>9} {'active_in':>9}")
    tot_steps_prev = 0
    for i, size in enumerate(sizes):
        last = i == len(sizes) - 1
        nxt = None if last else sizes[i + 1]
        win_st = jax.tree.map(lambda a: a[:size], full)
        win_tal = tallies._replace(
            rec=jnp.zeros((chunk, 8, size), rd),
            step_phase=jnp.zeros((), jnp.int32))
        key = (size, nxt is None)
        if key not in loops:
            loops[key] = jax.jit(lambda s, t, _n=nxt: level_loop(s, t, _n))
            loops[key](win_st, win_tal)  # compile
        active_in = int(np.asarray((win_st.status == ACTIVE).sum()))
        steps_in = int(np.asarray(win_st.nsteps, np.int64).sum())
        jax.block_until_ready((win_st, win_tal))
        t0 = time.time()
        win_st, win_tal = loops[key](win_st, win_tal)
        jax.block_until_ready(win_st.nsteps)
        dt = time.time() - t0
        steps_out = int(np.asarray(win_st.nsteps, np.int64).sum())
        executed = steps_out - steps_in
        # lane-steps burned = windows stepped x size; infer from the
        # max-stepped lane? approximate occupancy = executed /
        # (size x wall-implied windows): instead report executed rate
        rate = executed / dt / 1e6
        # occupancy proxy: executed / (size * (executed / active_avg))
        print(f"{size:>8} {dt*1e3:>9.1f} {executed:>12} "
              f"{rate:>9.1f} {'':>9} {active_in:>9}")
        tallies = win_tal._replace(rec=tallies.rec,
                                   step_phase=tallies.step_phase)
        if not last:
            order = lax.optimization_barrier(
                jnp.argsort(win_st.status != ACTIVE, stable=True))
            win_st = jax.tree.map(lambda a: a[order], win_st)
        full = jax.tree.map(
            lambda fa, wa: lax.dynamic_update_slice_in_dim(
                fa, wa, 0, axis=0), full, win_st)
    total = time.time() - total_t0
    steps_all = int(np.asarray(full.nsteps, np.int64).sum())
    print(f"total {total*1e3:.1f} ms   {steps_all} pushes  "
          f"{steps_all/total/1e6:.1f} M/s (incl. host sync per level)")


if __name__ == "__main__":
    main()
