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
    ap.add_argument("--cutoff-run", action="store_true",
                    help="raise pmax to 1e7 mp c (geometric pcut "
                    "ladder) so the electron radiative cutoff "
                    "(gamma_c ~ 2e9 at these fields, i.e. p ~ 1e6 "
                    "mp c) falls INSIDE the momentum range — the "
                    "shipped example's pmax of 500 mp c is 3 decades "
                    "below it, so no cutoff can appear there")
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
    if args.cutoff_run:
        from montecarloscattering_jl_tpu.utils.config import (
            auto_pcut_ladder, check_pcuts)
        cfg.pmax = 1.0e7 * K.MP_C
        cfg.pcuts = auto_pcut_ladder(cfg.pcuts[0], 2, cfg.emax,
                                     cfg.emax_per_aa, cfg.pmax)
        check_pcuts(cfg.pcuts, cfg.emax, cfg.emax_per_aa, cfg.pmax)

    t0 = time.perf_counter()
    res = run(cfg, p_dtype=jnp.float64 if args.f64 else jnp.float32,
              out_dir=args.out_dir)
    dt = time.perf_counter() - t0
    print(f"wall={dt:.1f}s trajs={res.n_trajectories} "
          f"pushes={res.n_pushes}")
    print("timers:", {k: round(v, 1)
                      for k, v in res.timers.totals.items()})
    em = res.iterations[-1].emission
    ok = True
    if em is not None:
        e_mev = np.asarray(em.e_tot) / K.MEV_ERG
        f = np.asarray(em.tot)
        nz = f > 0
        if nz.any():
            print(f"SED: {nz.sum()} nonzero bins over "
                  f"[{e_mev[nz].min():.1e}, {e_mev[nz].max():.1e}] MeV")
        else:
            print("SED: EMPTY (no nonzero bins)")
            ok = False

        # ---- in-tree physics checks (VERDICT r4 item 4) ----------------
        setup = res.setup
        i_el = next(i for i, s in enumerate(cfg.species)
                    if s.is_electron)
        fin_e = res.iterations[-1].ion_finals[i_el]
        fin_p = res.iterations[-1].ion_finals[0]
        zone = setup.i_shock + 3
        dnd_e = fin_e.dndp_cr[:, zone, 0]
        dnd_p = fin_p.dndp_cr[:, zone, 0]
        pc = setup.bins.mom_centers
        # electron radiative cutoff: the electron spectrum must END
        # below the proton spectrum's reach (synchrotron+IC losses cap
        # electron acceleration; protons are loss-free) — but only
        # when the theoretical loss-limited Lorentz factor gamma_c
        # (acceleration rate q B/(acc_fac m_e c) == loss rate
        # coeff*gamma^2) falls INSIDE the configured momentum range;
        # the shipped example's pmax sits ~3 decades below gamma_c,
        # so the assertion is gated (run --cutoff-run to see it)
        p_top_e = pc[np.nonzero(dnd_e > 0)[0]].max()
        p_top_p = pc[np.nonzero(dnd_p > 0)[0]].max()
        b_dw = setup.profile.bmag2
        u_rad = (b_dw ** 2 + (K.B_CMB0 * (1 + cfg.redshift) ** 2) ** 2
                 ) / (8.0 * np.pi)
        coeff = (4.0 / 3.0) * K.SIGMA_T * K.C_CGS * u_rad / K.ME_C2
        acc_fac = 10.0    # t_acc ~ acc_fac r_g/c (relativistic DSA)
        gamma_c = np.sqrt(K.QE_CGS * b_dw
                          / (acc_fac * K.ME_CGS * K.C_CGS * coeff))
        p_c = gamma_c * K.ME_CGS * K.C_CGS
        print(f"electron dN/dp reaches p = {p_top_e/K.MP_C:.3g} mp c; "
              f"proton reaches {p_top_p/K.MP_C:.3g} mp c; "
              f"loss-limited p_c ~ {p_c/K.MP_C:.3g} mp c")
        if p_c < 0.3 * p_top_p:
            if not p_top_e < 0.5 * p_top_p:
                print("FAIL: radiative cutoff expected at "
                      f"{p_c/K.MP_C:.3g} mp c but electrons reach "
                      "the proton top")
                ok = False
            else:
                print(f"radiative cutoff visible: electrons stop "
                      f"{p_top_p/p_top_e:.1f}x below protons")
        else:
            print("(cutoff beyond configured pmax — gated; use "
                  "--cutoff-run to exercise it)")

        # synchrotron / IC luminosity ratio ~ U_B / U_CMB order of
        # magnitude (same electrons radiate in both channels; the
        # zone mixture of B fields, the jet cone cut, and KN
        # corrections move the ratio around the Thomson estimate)
        lum_s = float(np.asarray(em.synch_shell).sum())
        lum_ic = float(np.asarray(em.ic_shell).sum())
        u_b = setup.profile.bmag2 ** 2 / (8.0 * np.pi)
        z = cfg.redshift
        # B_CMB0 is defined as the field whose u_B equals the CMB
        # energy density (constants.jl:10-11); u_CMB ~ (1+z)^4
        u_cmb = K.B_CMB0 ** 2 / (8.0 * np.pi) * (1.0 + z) ** 4
        ratio = lum_s / max(lum_ic, 1e-300)
        expect = u_b / u_cmb
        print(f"L_synch/L_IC = {ratio:.3g} vs U_B/U_CMB = "
              f"{expect:.3g} (x{ratio/expect:.2f})")
        if not (0.03 < ratio / expect < 30.0):
            print("FAIL: synch/IC ratio inconsistent with U_B/U_CMB")
            ok = False
    print("FLAGSHIP SED " + ("PASSED" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
