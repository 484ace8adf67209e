"""Keshet-Waxman N_g sweep: quantify the finite-N_g systematic.

VERDICT r4 item 5: the single-point acceptance (s_fit 4.427 vs s_KW
4.202 at tol 0.25) rode the tolerance edge because the per-scatter
deflection dtheta ~ sqrt(12 pi / (N_g eta)) converges to the
pitch-diffusion limit only as N_g -> inf (scattering.jl:60-75 is the
reference anchor for the cos_max systematic).  This script runs the
gamma0=5 test-particle index measurement at several N_g, fits
s(N_g) = s_inf + a * N_g^-p for p in {1/2, 1}, extrapolates
N_g -> inf, and stores the sweep as a JSON golden artifact.

The helix-step cap scales WITH N_g (cap = orbits * N_g) so every
point gets the same diffusive-orbit budget — at fixed cap a larger
N_g silently truncates acceleration (fewer gyro-orbits per segment)
and steepens the spectrum, which contaminated the round-7b
measurements.  Deep caps are safe now that drains are host-chunked
(ops/pallas_step._get_launch).

Usage: python scripts/flagship_kw_sweep.py [--ngs 4000,8000,16000,32000]
       [--per-pcut 8192] [--orbits 25] [-o kw_sweep.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(ng: float, per_pcut: int, cap: int, pmax: float,
              f64: bool):
    """One N_g measurement in a FRESH process (MCS_MAX_HELIX_STEPS is
    read at import time, and the kernel launch cache is keyed per
    process).  The cap is FIXED across the sweep (orbits * max(N_g)):
    the helix-step cap enters the compiled program, so one shared cap
    means one compile for the whole sweep, and an over-generous orbit
    budget at the smaller N_g cannot bias anything (the cap only
    truncates; the round-7b contamination came from the budget being
    too SMALL at large N_g)."""
    env = dict(os.environ, MCS_MAX_HELIX_STEPS=str(cap))
    cmd = [sys.executable,
           os.path.join(ROOT, "scripts", "flagship_keshet_waxman.py"),
           "--ng", str(ng), "--per-pcut", str(per_pcut),
           "--cap", str(cap), "--tol", "99", "--pmax", str(pmax)]
    if f64:
        cmd.append("--f64")
    t0 = time.perf_counter()
    out = subprocess.run(cmd, env=env, capture_output=True, text=True)
    dt = time.perf_counter() - t0
    s_fit = s_kw = pushes = None
    for ln in out.stdout.splitlines():
        if "s_fit =" in ln:
            s_fit = float(ln.split("s_fit =")[1].split()[0])
            s_kw = float(ln.split("s_KW =")[1].split()[0])
        if "pushes=" in ln:
            pushes = int(ln.split("pushes=")[1].split()[0])
    if s_fit is None:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise RuntimeError(f"N_g={ng}: no fit in output")
    print(f"N_g={ng:.0f} cap={cap} -> s_fit={s_fit:.3f} "
          f"(wall {dt:.0f}s, {pushes} pushes)", flush=True)
    return dict(ng=ng, cap=cap, s_fit=s_fit, s_kw=s_kw,
                pushes=pushes, wall_s=dt)


def main() -> int:
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--ngs", default="4000,8000,16000,32000")
    ap.add_argument("--per-pcut", type=int, default=8192)
    ap.add_argument("--orbits", type=int, default=25,
                    help="helix cap in gyro-orbits (cap = orbits*N_g)")
    ap.add_argument("--tol", type=float, default=0.1,
                    help="accepted |s_inf - s_KW| on the best fit")
    ap.add_argument("--pmax", type=float, default=2400.0,
                    help="maximum momentum in mp c; the default puts "
                    "the spectral cutoff 3 octaves above the fit "
                    "window (the historical pmax=300 bled cutoff "
                    "curvature into the fitted index: s_fit 4.44 vs "
                    "4.21 at pmax=2400, same N_g)")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("-o", "--out", default="kw_sweep.json")
    args = ap.parse_args()

    ngs = [float(x) for x in args.ngs.split(",")]
    cap = int(args.orbits * max(ngs))
    points = [run_point(ng, args.per_pcut, cap, args.pmax, args.f64)
              for ng in ngs]
    s_kw = points[0]["s_kw"]
    x = np.array([p["ng"] for p in points])
    y = np.array([p["s_fit"] for p in points])

    fits = {}
    for p_exp, name in ((0.5, "invsqrt"), (1.0, "inv")):
        c = np.polyfit(x ** -p_exp, y, 1)
        resid = y - np.polyval(c, x ** -p_exp)
        fits[name] = dict(s_inf=float(c[1]), slope=float(c[0]),
                          rms=float(np.sqrt(np.mean(resid ** 2))))
        print(f"s(N_g) = {c[1]:.3f} + {c[0]:.1f} * N_g^-{p_exp}: "
              f"s_inf = {c[1]:.3f} (rms {fits[name]['rms']:.4f})",
              flush=True)
    best = min(fits, key=lambda k: fits[k]["rms"])
    s_inf = fits[best]["s_inf"]
    ok = abs(s_inf - s_kw) <= args.tol
    print(f"best model {best}: s_inf = {s_inf:.3f} vs s_KW = "
          f"{s_kw:.3f} (|diff| = {abs(s_inf - s_kw):.3f}) -> "
          + ("PASSED" if ok else "FAILED"), flush=True)

    with open(args.out, "w") as f:
        json.dump(dict(points=points, fits=fits, best=best,
                       s_inf=s_inf, s_kw=s_kw,
                       tol=args.tol, passed=bool(ok)), f, indent=1)
    print(f"sweep artifact -> {args.out}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
