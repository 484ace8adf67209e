"""Flagship single-chip benchmark: relativistic p+e shock with the
full multi-messenger SED (BASELINE.md configs 3+4).

Measured 2026-08-16 on one TPU v5e chip (f32 momenta, fused pcut
ladder, warm compile cache), 16384 lanes/pcut on the gamma0 = 5
example config:

    wall = 139.5 s  (transport 104 s, reductions 33 s, emission 1.0 s)
    296 737 trajectories, 371 M pushes
    SED: 192 nonzero bins spanning 1e-13 ... 7.9e6 MeV
         (synchrotron radio->X, IC MeV, pion-decay GeV)

Usage:

    python scripts/flagship_sed.py [--per-pcut 16384]
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
    ap.add_argument("--per-pcut", type=int, default=16384)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("-o", "--out-dir", default="flagship_sed_out")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from montecarloscattering_jl_tpu.engine import run
    from montecarloscattering_jl_tpu.utils import constants as K
    from montecarloscattering_jl_tpu.utils import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "examples/04_hadronic_sed.toml"))
    cfg.n_pts_inj = args.per_pcut
    cfg.n_pts_pcut = args.per_pcut
    cfg.n_pts_pcut_hi = args.per_pcut

    t0 = time.perf_counter()
    res = run(cfg, p_dtype=jnp.float64 if args.f64 else jnp.float32,
              out_dir=args.out_dir)
    dt = time.perf_counter() - t0
    print(f"wall={dt:.1f}s trajs={res.n_trajectories} "
          f"pushes={res.n_pushes}")
    print("timers:", {k: round(v, 1)
                      for k, v in res.timers.totals.items()})
    em = res.iterations[-1].emission
    if em is not None:
        e_mev = np.asarray(em.e_tot) / K.MEV_ERG
        f = np.asarray(em.tot)
        nz = f > 0
        print(f"SED: {nz.sum()} nonzero bins over "
              f"[{e_mev[nz].min():.1e}, {e_mev[nz].max():.1e}] MeV")


if __name__ == "__main__":
    main()
