"""Sweep steps-per-launch for the megakernel drain.

Separates the per-launch FIXED overhead (kernel prologue, drive
while-loop body, act reduction, partition conditionals) from the
per-lane-step compute: a drain-to-empty segment at a given batch runs
~max_lane_steps/n_steps launches, so halving the launch count at equal
lane-steps exposes the fixed term.  This sizes the adaptive-launch
optimization for the ladder's drain tail (few survivors x many steps).

Usage: python scripts/probe_launch_steps.py [--batch 65536]
       [--steps 128,256,512,1024]
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--steps", default="128,256,512,1024")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1 (rep 0 is the compile warmup)")

    import __graft_entry__ as ge
    from montecarloscattering_jl_tpu.ops import pallas_step as ps
    from montecarloscattering_jl_tpu.ops import state as stt

    setup, state0, tal0, grids, sc, ss = ge._build(
        batch=args.batch, p_dtype=jnp.float32)
    if not ps.megakernel_ok(ss, jnp.float32, jnp.float32):
        raise SystemExit("megakernel not available on this backend")

    for n_steps in [int(s) for s in args.steps.split(",")]:
        best = None
        for rep in range(args.reps + 1):
            st = jax.tree.map(jnp.copy, state0)
            tl = jax.tree.map(jnp.copy, tal0)
            t0 = time.perf_counter()
            st2, _ = ps.run_segment_mega(st, tl, grids, sc, ss,
                                         steps_per_launch=n_steps)
            jax.block_until_ready(st2.nsteps)
            dt = time.perf_counter() - t0
            pushes = int(np.asarray(st2.nsteps, np.int64).sum())
            maxs = int(np.asarray(st2.nsteps).max())
            if rep > 0 and (best is None or pushes / dt > best[0]):
                best = (pushes / dt, dt, pushes, maxs)
        rate, dt, pushes, maxs = best
        launches = -(-maxs // n_steps)
        print(f"steps/launch {n_steps:5d}: {rate/1e6:7.1f} M pushes/s "
              f"({dt*1e3:7.1f} ms, {pushes/1e6:.1f} M pushes, "
              f"max lane {maxs} steps, ~{launches} launches)")


if __name__ == "__main__":
    main()
