"""Pod-scale mesh flagship: the nonlinear smoothed shock sharded over
a device mesh (BASELINE.md config 5 — 1e9-trajectory scale).

The particle batch shards over a 1-D 'dp' mesh; on TPU every shard
rides the megakernel hybrid ladder (one [drain -> finish -> split]
program per pcut, parallel/shard.sharded_hybrid_seg) with
accumulators reduced once per species over ICI — the same engine the
single-chip flagship measures, so throughput should scale ~linearly
with chips at fixed per-chip batch (lanes are independent between
tallies; the only collectives are the per-segment psums of n_new /
nsteps / oob and the per-ion tally reduction).

Sizing: per-chip lanes must be a multiple of the megakernel block
(MCS_MEGA_ROWS*128 = 4096 by default) for the mesh hybrid to engage —
the engine pads automatically and logs the engine selection.  At the
single-chip rate of ~43 M pushes/s sustained e2e (STATUS.md), 1e9
trajectories (~2.5e12 pushes at the flagship's ~2.4k pushes/traj)
needs ~16 chip-hours — a v5e-64 slice covers it in ~15 min.

Multi-host pods: pass --multihost to initialize jax.distributed first
(parallel/multihost.py); run one process per host with the same args.

CPU rehearsal (the workflow, not the numbers):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/flagship_mesh.py --devices 8 --per-pcut 1024 --iters 2
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size (0 = all visible devices)")
    ap.add_argument("--per-pcut", type=int, default=65536,
                    help="split target per pcut level (global, not "
                    "per chip)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed before building "
                    "the mesh (one process per host)")
    ap.add_argument("-o", "--out-dir", default="flagship_mesh_out")
    args = ap.parse_args()

    if args.multihost:
        from montecarloscattering_jl_tpu.parallel.multihost import (
            init_distributed)
        init_distributed()

    import jax.numpy as jnp

    from montecarloscattering_jl_tpu.engine import run
    from montecarloscattering_jl_tpu.parallel.shard import make_mesh
    from montecarloscattering_jl_tpu.utils import load_config

    mesh = make_mesh(args.devices or None)
    print(f"mesh: {mesh.size} devices ({jax.default_backend()})")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "tests/data/dsa_nonrel.toml"))
    cfg.n_itrs = args.iters
    cfg.do_smoothing = True
    cfg.n_pts_inj = args.per_pcut
    cfg.n_pts_pcut = args.per_pcut
    cfg.n_pts_pcut_hi = args.per_pcut

    t0 = time.perf_counter()
    res = run(cfg, p_dtype=jnp.float64 if args.f64 else jnp.float32,
              mesh=mesh, out_dir=args.out_dir)
    dt = time.perf_counter() - t0
    print(f"wall={dt:.1f}s trajs={res.n_trajectories} "
          f"pushes={res.n_pushes} -> {res.n_trajectories/dt:.0f} "
          f"trajs/s, {res.n_pushes/dt/1e6:.1f} M pushes/s "
          f"({res.n_pushes/dt/1e6/mesh.size:.1f} M/chip)")
    print("timers:", {k: round(v, 1)
                      for k, v in res.timers.totals.items()})
    os._exit(0)   # axon teardown can hang at interpreter exit


if __name__ == "__main__":
    main()
