"""Band-width throughput sweep (VERDICT r3 item 3): how much of a
megakernel launch is the per-step band tally?

The per-crossing tally cost is structural: a band x 128 bf16 MAC
one-hot contraction per crossing record (docs/design.md "Roofline /
MFU").  The band is a static kernel parameter (MCS_MEGA_BAND
override), so sweeping it on the SAME drain workload isolates the
band-contraction share of kernel time directly: rate(band) vs band is
the ablation curve, and extrapolating to band -> 0 bounds the
physics + RNG + movement share.  This also prices the derived
relativistic band (8448 cells at gamma0 = 5): the rate at 8448 is
what the --dsa science run pays per launch vs the 2048-cell
nonrelativistic default.

Correctness note: bands narrower than the population's per-step
spread drop records; the drain's oob check raises in that case and
the row is reported as oob-failed rather than a rate (a 256-cell
baseline-binning band covers 0.08 decades — expected to fail; that
failure IS the negative result for the "narrower band" lever unless a
two-level encoding backs it).

Usage (chip): python scripts/probe_band_width.py [--bands 512,1024,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser(
    os.environ.get("MCS_CACHE_DIR", "~/.cache/mcs_xla")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands", default="512,1024,2048,4096,8448")
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from montecarloscattering_jl_tpu.engine.run import TransportEngine
    from montecarloscattering_jl_tpu.engine.setup import build_setup
    from montecarloscattering_jl_tpu.models.injection import init_pop
    from montecarloscattering_jl_tpu.ops import pallas_step as pstep
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.utils import load_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "tests", "data",
                                   "dsa_nonrel.toml"))
    setup = build_setup(cfg)
    prof = setup.profile

    rng = np.random.default_rng(0)
    pop = init_pop(rng, cfg.species, 0, 1, cfg.energy_inj, True,
                   cfg.n_pts_inj, setup.x_grid_start, cfg.rg0, 1.0,
                   True, -1.0, cfg.beta0, cfg.gamma0, cfg.u0,
                   setup.x_grid_rg, prof.ux_sk, prof.gamma_sf)

    def fresh(seed, batch, p_dtype):
        reps = batch // len(pop.ptot_pf) + 1
        t = lambda a: np.tile(a, reps)[:batch]
        return stt.init_state(
            t(pop.weight), t(pop.ptot_pf), t(pop.pb_pf), t(pop.x_cm),
            t(pop.i_grid).astype(np.int32), t(prof.ux_sk[pop.i_grid]),
            cfg.xn_per_fine, setup.x_grid_stop, jax.random.key(seed),
            p_dtype=p_dtype)

    rows = []
    for band in (int(b) for b in args.bands.split(",")):
        os.environ["MCS_MEGA_BAND"] = str(band)
        eng = TransportEngine(setup, p_dtype=jnp.float32)
        grids = eng.segment_grids(prof)
        sc = eng.segment_scalars(0, 2, prof.bmag2)
        ss = eng.step_static(0)   # re-derives mega_band from the env
        # the derivation caps the band at the padded full array (the
        # test config's PSD is only 4480 cells)
        band = ss.mega_band
        tal = lambda: stt.make_tallies(
            setup.nb, setup.bins.n_mom, setup.bins.n_theta, 0, 0,
            jnp.float32, batch=args.batch, chunk=8,
            p_dtype=jnp.float32)
        try:
            out = pstep.run_segment_mega(
                fresh(0, args.batch, jnp.float32), tal(), grids, sc,
                ss)
            jax.block_until_ready(out[0].nsteps)   # compile + warm
            rate, pushes = 0.0, 0
            for i in range(args.reps):
                s_in = fresh(i + 1, args.batch, jnp.float32)
                t0 = time.time()
                s_out, _ = pstep.run_segment_mega(s_in, tal(), grids,
                                                  sc, ss)
                jax.block_until_ready(s_out.nsteps)
                p = int(np.asarray(s_out.nsteps, np.int64).sum())
                dt = time.time() - t0
                if p / dt > rate:
                    rate, pushes = p / dt, p
            row = {"band": band, "mpushes_per_s": round(rate / 1e6, 1),
                   "pushes": pushes, "oob": "ok"}
        except RuntimeError as e:
            row = {"band": band, "mpushes_per_s": None,
                   "oob": str(e).split(";")[0][:120]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if r["mpushes_per_s"]]
    if len(ok) >= 2:
        # linear model time/push = a + b*band: the band share at 2048
        t = np.array([1e6 / r["mpushes_per_s"] / 1e6 for r in ok])
        b_arr = np.array([r["band"] for r in ok], np.float64)
        A = np.vstack([np.ones_like(b_arr), b_arr]).T
        coef, *_ = np.linalg.lstsq(A, t, rcond=None)
        share = coef[1] * 2048 / (coef[0] + coef[1] * 2048)
        print(f"\nfit: time/push = {coef[0]*1e9:.2f} ns + "
              f"{coef[1]*1e12:.3f} ps/band-cell -> band tally share "
              f"at 2048 cells = {share:.1%}; at 8448 = "
              f"{coef[1]*8448/(coef[0]+coef[1]*8448):.1%}")
    os._exit(0)


if __name__ == "__main__":
    main()
