"""Single-chip endurance run (VERDICT r3 item 5a): drive >= 1e8
trajectories through the megakernel hybrid ladder and prove HBM
stability over a multi-hour-scale run.

The pod north star (BASELINE.md) is 1e9 trajectories over a slice; the
per-chip share of that is ~1e8 trajectories sustained without HBM
creep (the round-6 IonFinal fix showed device-buffer growth can hide
for many iterations) and without rate decay.  This script repeats the
flagship nonlinear workload block by block at a frozen converged
profile — transport + the full per-species device reduction, the
steady-state composition of a long run — and records per-block:
wall, trajectories, pushes, push rate, and the device's
bytes_in_use / peak_bytes_in_use from memory_stats().

Pass criteria printed at the end:
  * bytes_in_use drift from block 2 to the last block < 1% (block 1
    warms compiles and the donation pool);
  * per-block push rate within 5% of the median across blocks.

Usage (chip):  python scripts/flagship_endurance.py --trajectories 1e8
Smoke (CPU):   JAX_PLATFORMS=cpu python scripts/flagship_endurance.py \
                   --trajectories 2e4 --per-pcut 2048
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# positions/PRP/acctime are float64 by contract (the grid spans 14
# decades with 1e30 sentinels); this script drives TransportEngine
# directly, so enable x64 here the way engine.run() would
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    os.environ.get("MCS_CACHE_DIR", "~/.cache/mcs_xla")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def mem() -> dict:
    d = jax.local_devices()[0]
    try:
        s = d.memory_stats() or {}
    except Exception:
        s = {}
    return {"in_use": int(s.get("bytes_in_use", 0)),
            "peak": int(s.get("peak_bytes_in_use", 0))}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trajectories", type=float, default=1e8)
    ap.add_argument("--per-pcut", type=int, default=262144,
                    help="split target per pcut level")
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from montecarloscattering_jl_tpu.engine.driver import (
        ion_finalize_start)
    from montecarloscattering_jl_tpu.engine.run import TransportEngine
    from montecarloscattering_jl_tpu.engine.setup import build_setup
    from montecarloscattering_jl_tpu.utils import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "tests/data/dsa_nonrel.toml"))
    cfg.do_smoothing = True
    cfg.n_pts_inj = args.per_pcut
    cfg.n_pts_pcut = args.per_pcut
    cfg.n_pts_pcut_hi = args.per_pcut

    setup = build_setup(cfg)
    engine = TransportEngine(
        setup, p_dtype=jnp.float64 if args.f64 else jnp.float32)
    prof = setup.profile

    target = int(args.trajectories)
    blocks = []
    t_start = time.perf_counter()
    i_iter = 0
    while engine.n_trajectories_total < target:
        t0 = time.perf_counter()
        it = engine.new_iteration_tallies(prof)
        tr0, pu0 = engine.n_trajectories_total, engine.n_pushes_total
        for i_ion in range(cfg.n_ions):
            res = engine.run_ion(i_iter, i_ion, prof, it)
            # steady-state composition: the reduction pipeline runs
            # too (its buffers were the round-6 HBM-creep source);
            # products are discarded, leakage would still accumulate
            fin = ion_finalize_start(setup, res, prof, i_ion,
                                     i_ion == cfg.n_ions - 1)()
            del fin, res
        dt = time.perf_counter() - t0
        m = mem()
        blk = {
            "block": i_iter,
            "wall_s": round(dt, 2),
            "trajs": engine.n_trajectories_total - tr0,
            "pushes": engine.n_pushes_total - pu0,
            "mpushes_per_s": round(
                (engine.n_pushes_total - pu0) / dt / 1e6, 1),
            "hbm_in_use_mb": round(m["in_use"] / 1e6, 1),
            "hbm_peak_mb": round(m["peak"] / 1e6, 1),
            "total_trajs": engine.n_trajectories_total,
        }
        blocks.append(blk)
        print(json.dumps(blk), flush=True)
        i_iter += 1

    wall = time.perf_counter() - t_start
    rates = np.array([b["mpushes_per_s"] for b in blocks[1:]]
                     or [blocks[0]["mpushes_per_s"]])
    hbm = np.array([b["hbm_in_use_mb"] for b in blocks[1:]]
                   or [blocks[0]["hbm_in_use_mb"]])
    med = float(np.median(rates))
    drift = (hbm[-1] - hbm[0]) / max(hbm[0], 1e-9)
    decay = (rates.min() - med) / med
    print(f"\nendurance: {engine.n_trajectories_total:.3g} trajs, "
          f"{engine.n_pushes_total:.3g} pushes in {wall:.0f}s "
          f"({engine.n_pushes_total / wall / 1e6:.1f} M pushes/s "
          f"sustained, {engine.n_trajectories_total / wall:.0f} "
          f"trajs/s)")
    print(f"HBM drift (block 2 -> last): {drift:+.2%} "
          f"({'PASS' if abs(drift) < 0.01 else 'FAIL'} < 1%)")
    print(f"rate floor vs median: {decay:+.2%} "
          f"({'PASS' if decay > -0.05 else 'FAIL'} within 5%)")
    os._exit(0)   # axon teardown can hang at interpreter exit


if __name__ == "__main__":
    main()
