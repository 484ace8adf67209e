"""Flagship single-chip benchmark: nonlinear smoothed shock to
convergence at production batch size (BASELINE.md config 2).

Measured 2026-08-16 on one TPU v5e chip (f32 momenta, fused pcut
ladder, warm compile cache):

    wall = 924 s for 10 iterations
    4.15 M trajectories, 10.2 B pushes (11.1 M pushes/s sustained)
    timers: transport 814 s, reductions 99 s, smoothing+io < 1 s
    convergence: max pxx_flux / far-upstream-flux overshoot decays
    5.38 (iter 1) -> 1.38 -> 1.13 -> 1.09 -> 1.05 (iter 9), with the
    relaxation-damped even iterations pinned at 1.000

Usage (defaults reproduce the numbers above):

    python scripts/flagship_nonlinear.py [--per-pcut 65536] [--iters 10]
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
    ap.add_argument("--per-pcut", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("-o", "--out-dir", default="flagship_out")
    args = ap.parse_args()

    import jax.numpy as jnp

    from montecarloscattering_jl_tpu.engine import run
    from montecarloscattering_jl_tpu.utils import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "tests/data/dsa_nonrel.toml"))
    cfg.n_itrs = args.iters
    cfg.do_smoothing = True
    cfg.n_pts_inj = args.per_pcut
    cfg.n_pts_pcut = args.per_pcut
    cfg.n_pts_pcut_hi = args.per_pcut

    t0 = time.perf_counter()
    res = run(cfg, p_dtype=jnp.float64 if args.f64 else jnp.float32,
              out_dir=args.out_dir)
    dt = time.perf_counter() - t0
    print(f"wall={dt:.1f}s trajs={res.n_trajectories} "
          f"pushes={res.n_pushes} -> {res.n_trajectories/dt:.0f} trajs/s,"
          f" {res.n_pushes/dt/1e6:.1f}M pushes/s")
    for i, itr in enumerate(res.iterations):
        pxx = float(max(itr.diag.pxx_norm)) if itr.diag else float("nan")
        print(f"iter {i+1}: gamma_dw={itr.gamma_downstream:.4f} "
              f"en_esc={itr.en_esc_frac:.4f} pxx_norm_max={pxx:.3f}")
    print("timers:", {k: round(v, 1)
                      for k, v in res.timers.totals.items()})
    sub = getattr(res, "subtimers", None)
    if sub:
        print("transport breakdown:", {k: round(v, 1)
                                       for k, v in sub.items()})


if __name__ == "__main__":
    main()
