"""Repro harness for the fused-ladder TPU fault at batch >= 128k.

Runs one species through the fused pcut ladder (ops/fused_ion.py) at a
configurable batch size.  Round 1 recorded a reproducible TPU runtime
"kernel fault" at >= 131072 lanes (commit 01a77c7); this script is the
bisection driver for root-causing it.

Usage: python scripts/repro_fused_128k.py [batch] [n_pcuts] [n_blocks] [levels]

n_blocks > 1 exercises run_ion_fused_blocked (the workaround: the same
ladder over <= 64k-lane blocks); levels > 0 adds the compaction ladder.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    os.environ.get("MCS_CACHE_DIR", "~/.cache/mcs_xla")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from montecarloscattering_jl_tpu.engine.run import (  # noqa: E402
    TransportEngine, pcut_hi_momentum)
from montecarloscattering_jl_tpu.engine.setup import build_setup  # noqa: E402
from montecarloscattering_jl_tpu.models.injection import init_pop  # noqa: E402
from montecarloscattering_jl_tpu.ops import state as stt  # noqa: E402
from montecarloscattering_jl_tpu.ops.fused_ion import run_ion_fused_jit  # noqa: E402
from montecarloscattering_jl_tpu.utils import load_config  # noqa: E402

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "dsa_nonrel.toml")


def main(batch: int, n_pcuts: int | None, n_blocks: int = 1,
         levels: int = 0):
    cfg = load_config(CFG)
    setup = build_setup(cfg)
    eng = TransportEngine(setup, fused=True)
    eng.batch_size = batch
    b = batch
    prof = setup.profile
    bins, nb = setup.bins, setup.nb
    i_ion = 0
    s = cfg.species[i_ion]

    grids = eng.segment_grids(prof)
    ss = eng.step_static(i_ion)
    ion_key = jax.random.fold_in(jax.random.fold_in(eng.base_key, 0), i_ion)

    rng = np.random.default_rng((cfg.random_seed, 0, i_ion))
    pop = init_pop(rng, cfg.species, i_ion, cfg.inp_distr, cfg.energy_inj,
                   cfg.inj_weight, cfg.n_pts_inj, setup.x_grid_start,
                   cfg.rg0, cfg.eta_mfp, cfg.do_fast_push, cfg.x_fast_stop_rg,
                   cfg.beta0, cfg.gamma0, cfg.u0, setup.x_grid_rg,
                   prof.ux_sk, prof.gamma_sf)
    n0 = len(pop.ptot_pf)
    reps = b // n0 + 1
    t = lambda a: np.tile(a, reps)[:b]
    state = stt.init_state(
        t(pop.weight) / reps, t(pop.ptot_pf), t(pop.pb_pf), t(pop.x_cm),
        t(pop.i_grid).astype(np.int32), t(prof.ux_sk[pop.i_grid]),
        cfg.xn_per_fine, setup.x_grid_stop, jax.random.fold_in(ion_key, 0))

    pcut_list = cfg.pcuts if n_pcuts is None else cfg.pcuts[:n_pcuts]
    p_pcut_hi = pcut_hi_momentum(cfg.energy_pcut_hi, s.mass)
    pcuts = jnp.asarray(pcut_list, jnp.float64)
    pcut_prevs = jnp.asarray(np.concatenate([[0.0], pcut_list[:-1]]))
    n_targets = jnp.asarray(
        [b if p < p_pcut_hi else b for p in pcut_list], jnp.int32)
    seg_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        ion_key, jnp.arange(1, len(pcut_list) + 1, dtype=jnp.uint32))
    sc = eng.segment_scalars(i_ion, 0, prof.bmag2)
    tal = stt.make_tallies(nb, bins.n_mom, bins.n_theta, 0, 1,
                           jnp.float32, batch=b, chunk=eng.tally_chunk)
    esc = jax.tree.map(jnp.asarray,
                       __import__("montecarloscattering_jl_tpu.ops.finish",
                                  fromlist=["EscapeTallies"])
                       .EscapeTallies.zeros(bins.n_mom, bins.n_theta))

    print(f"batch={b} n_pcuts={len(pcut_list)} n_blocks={n_blocks} "
          f"levels={levels} devices={jax.devices()}", flush=True)
    t0 = time.time()
    if n_blocks > 1:
        # host-level blocking (the production workaround in
        # engine/run.py): separate <= 64k-lane jit dispatches, tallies
        # threaded through.  NOTE: the lax.map on-device variant was
        # tried and ALSO faults at >= 128k total lanes.
        block = b // n_blocks
        block_targets = jnp.maximum(n_targets // n_blocks, 1)
        tal = stt.make_tallies(nb, bins.n_mom, bins.n_theta, 0, 1,
                               jnp.float32, batch=block,
                               chunk=eng.tally_chunk)
        n_new = jnp.zeros(len(pcut_list), jnp.int64)
        nsteps = jnp.zeros(len(pcut_list), jnp.uint64)
        for ib in range(n_blocks):
            st_b = jax.tree.map(
                lambda a: a[ib * block:(ib + 1) * block], state)
            keys_b = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                seg_keys, jnp.uint32(ib))
            st_b, tal, esc, n_new_b, nsteps_b = run_ion_fused_jit(
                st_b, tal, esc, grids, sc, ss, pcuts, pcut_prevs,
                block_targets, keys_b, compact_levels=levels)
            n_new = n_new + n_new_b.astype(jnp.int64)
            nsteps = nsteps + nsteps_b
        state = st_b
    else:
        state, tal, esc, n_new, nsteps = run_ion_fused_jit(
            state, tal, esc, grids, sc, ss, pcuts, pcut_prevs,
            n_targets, seg_keys, compact_levels=levels)
    jax.block_until_ready(state)
    dt = time.time() - t0
    tot = int(np.asarray(nsteps, np.uint64).sum())
    print(f"OK: {tot} pushes in {dt:.1f}s = {tot/dt/1e6:.1f}M pushes/s",
          flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    np_ = int(sys.argv[2]) if len(sys.argv) > 2 else None
    nb_ = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    lv_ = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    main(b, np_, nb_, lv_)
