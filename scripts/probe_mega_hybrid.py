"""Measure the three pcut-ladder drivers on the real chip:

  A. XLA fused scan ladder      (ops/fused_ion.run_ion_fused_jit)
  B. megakernel-in-scan ladder  (ops/pallas_step.run_ion_fused_mega_jit)
  C. megakernel hybrid ladder   (ops/pallas_step.run_ion_mega_hybrid)

Each variant runs the full 6-pcut dsa_nonrel ladder at a flagship-like
batch, timed as (first call = compile + run, second call = steady
state).  This is the measurement behind making the hybrid the default
mega path (VERDICT round-3 item 1).

Usage: python scripts/probe_mega_hybrid.py [--batch 65536] [--skip A,B]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    os.environ.get("MCS_CACHE_DIR", "~/.cache/mcs_xla")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np


def build(batch):
    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import state as stt

    setup, state, tal, grids, sc, ss = ge._build(batch=batch,
                                                 p_dtype=jnp.float32)
    cfg = setup.cfg
    pcuts = np.asarray(cfg.pcuts, np.float64)
    prevs = np.concatenate([[0.0], pcuts[:-1]])
    n_seg = len(pcuts)
    targets = np.full(n_seg, batch, np.int64)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(7), jnp.arange(1, n_seg + 1, dtype=jnp.uint32))
    return setup, state, tal, grids, sc, ss, pcuts, prevs, targets, keys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--skip", default="")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    from montecarloscattering_jl_tpu.ops import fused_ion as fi
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops.finish import EscapeTallies

    (setup, state0, tal0, grids, sc, ss, pcuts, prevs, targets,
     keys) = build(args.batch)
    bins = setup.bins

    def fresh():
        esc = EscapeTallies.zeros(bins.n_mom, bins.n_theta)
        st = jax.tree.map(jnp.copy, state0)
        tl = jax.tree.map(jnp.copy, tal0)
        return st, tl, esc

    def report(tag, dt, nsteps):
        tot = float(np.asarray(nsteps, np.float64).sum())
        print(f"{tag}: wall={dt:.2f}s pushes={tot/1e6:.1f}M "
              f"-> {tot/dt/1e6:.1f} M pushes/s", flush=True)

    variants = {}
    if "A" not in skip:
        def run_a():
            st, tl, esc = fresh()
            out = fi.run_ion_fused_jit(
                st, tl, esc, grids, sc, ss,
                jnp.asarray(pcuts, jnp.float32),
                jnp.asarray(prevs, jnp.float32),
                jnp.asarray(targets, jnp.int32), keys, 0)
            jax.block_until_ready(out[1])
            return out[4]
        variants["A_xla_scan"] = run_a
    if "B" not in skip:
        def run_b():
            st, tl, esc = fresh()
            out = ps.run_ion_fused_mega_jit(
                st, tl, esc, grids, sc, ss,
                jnp.asarray(pcuts, jnp.float32),
                jnp.asarray(prevs, jnp.float32),
                jnp.asarray(targets, jnp.int32), keys)
            jax.block_until_ready(out[1])
            return out[4]
        variants["B_mega_scan"] = run_b
    if "C" not in skip:
        def run_c():
            st, tl, esc = fresh()
            out = ps.run_ion_mega_hybrid(
                st, tl, esc, grids, sc, ss, pcuts, prevs, targets, keys)
            jax.block_until_ready(out[1])
            return out[4]
        variants["C_mega_hybrid"] = run_c

    for tag, fn in variants.items():
        t0 = time.perf_counter()
        nsteps = fn()
        report(f"{tag} cold", time.perf_counter() - t0, nsteps)
        for r in range(args.reps - 1):
            t0 = time.perf_counter()
            nsteps = fn()
            report(f"{tag} warm{r+1}", time.perf_counter() - t0, nsteps)

    os._exit(0)   # axon teardown can hang ~2 min at interpreter exit


if __name__ == "__main__":
    main()
