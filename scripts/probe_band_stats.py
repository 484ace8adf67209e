"""Capture real crossing-record statistics from a transport window.

The planned non-scatter PSD histogram (a band-limited one-hot matmul on
the MXU) is only viable if, per flush window, the records' flat
(ip, kind, jt) cells cluster in a narrow band.  This script runs the
bench workload and reports, per 8-step flush:

  - crossing rate (fraction of lane-steps with a real record),
  - the cell span (max - min over real records) in the CURRENT layout
    (kind, ip, jt) and in the band-friendly (ip, kind, jt) reorder,
  - the zone span of lo/hi endpoints.

Usage: python scripts/probe_band_stats.py [batch] [n_steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def main() -> None:
    from montecarloscattering_jl_tpu.engine.run import TransportEngine
    from montecarloscattering_jl_tpu.engine.setup import build_setup
    from montecarloscattering_jl_tpu.models.injection import init_pop
    from montecarloscattering_jl_tpu.ops import state as stt
    from montecarloscattering_jl_tpu.ops import step as stp
    from montecarloscattering_jl_tpu.utils import load_config

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "tests", "data", "dsa_nonrel.toml"))
    setup = build_setup(cfg)
    eng = TransportEngine(setup, p_dtype=jnp.float32)
    prof = setup.profile
    grids = eng.segment_grids(prof)
    sc = eng.segment_scalars(0, 2, prof.bmag2)
    ss = eng.step_static(0)
    n_mom, n_theta, nb = ss.n_mom, ss.n_theta, ss.nb
    nzc = nb + 1
    print(f"dims: n_mom={n_mom} n_theta={n_theta} nb={nb} "
          f"cells={2 * (n_mom + 1) * (n_theta + 1)} nzc={nzc}")

    rng = np.random.default_rng(0)
    pop = init_pop(rng, cfg.species, 0, 1, cfg.energy_inj, True,
                   cfg.n_pts_inj, setup.x_grid_start, cfg.rg0, 1.0,
                   True, -1.0, cfg.beta0, cfg.gamma0, cfg.u0,
                   setup.x_grid_rg, prof.ux_sk, prof.gamma_sf)
    reps = BATCH // len(pop.ptot_pf) + 1
    t = lambda a: np.tile(a, reps)[:BATCH]
    state = stt.init_state(
        t(pop.weight), t(pop.ptot_pf), t(pop.pb_pf), t(pop.x_cm),
        t(pop.i_grid).astype(np.int32), t(prof.ux_sk[pop.i_grid]),
        cfg.xn_per_fine, setup.x_grid_stop, jax.random.key(7),
        p_dtype=jnp.float32)
    tal = stt.make_tallies(nb, n_mom, n_theta, 0, 0, jnp.float32,
                           batch=BATCH, chunk=8, p_dtype=jnp.float32)

    @jax.jit
    def eight(state, tal):
        def body(i, c):
            s, tl = c
            return stp.helix_step(s, tl, grids, sc, ss)
        # run 7 steps, then grab rec before the 8th step's flush
        state, tal = jax.lax.fori_loop(0, 7, body, (state, tal))
        rec_preview = tal.rec
        state, tal = stp.helix_step(state, tal, grids, sc, ss)
        return state, tal, rec_preview

    spans_cur, spans_reord, rates, zone_spans, n_active = [], [], [], [], []
    ip_spans = []
    for w in range(N_STEPS // 8):
        state, tal, rec = eight(state, tal)
        rec = np.asarray(rec)          # [8, 8, B] (partial: 7 steps live)
        psd_w = rec[:, 4, :].ravel()
        lo = rec[:, 5, :].ravel().astype(np.int64)
        hi = rec[:, 6, :].ravel().astype(np.int64)
        base = rec[:, 7, :].ravel().astype(np.int64)
        real = psd_w != 0.0
        rates.append(real.mean())
        act = int(np.asarray(state.status == stt.ACTIVE).sum())
        n_active.append(act)
        if not real.any():
            continue
        # rec[7] = flat cell in the (ip, kind, jt) band-friendly layout
        cell2 = base[real]
        jt = cell2 % (n_theta + 1)
        ipk = cell2 // (n_theta + 1)
        kind = ipk % 2
        ip = ipk // 2
        # legacy (kind, ip, jt) layout span, for comparison
        cell = (kind * (n_mom + 1) + ip) * (n_theta + 1) + jt
        spans_cur.append(cell.max() - cell.min() + 1)
        spans_reord.append(cell2.max() - cell2.min() + 1)
        ip_spans.append((ip.min(), ip.max()))
        zone_spans.append((lo[real].min(), hi[real].max()))

    spans_cur = np.array(spans_cur)
    spans_reord = np.array(spans_reord)
    rates = np.array(rates)
    print(f"windows: {len(spans_cur)}  active lanes last: {n_active[-1]}"
          f" / {BATCH}")
    print(f"crossing rate: mean {rates.mean():.3f}  max {rates.max():.3f}")
    print(f"cell span (kind,ip,jt layout): median {np.median(spans_cur):.0f}"
          f"  p90 {np.percentile(spans_cur, 90):.0f}  max {spans_cur.max()}")
    print(f"cell span (ip,kind,jt reorder): median "
          f"{np.median(spans_reord):.0f}  p90 "
          f"{np.percentile(spans_reord, 90):.0f}  max {spans_reord.max()}")
    ipmin = min(s[0] for s in ip_spans)
    ipmax = max(s[1] for s in ip_spans)
    print(f"ip range across run: [{ipmin}, {ipmax}]  per-window spans: "
          f"{sorted(set((int(b - a + 1)) for a, b in ip_spans))}")
    zmin = min(s[0] for s in zone_spans)
    zmax = max(s[1] for s in zone_spans)
    print(f"zone endpoint range: [{zmin}, {zmax}]")


if __name__ == "__main__":
    main()
