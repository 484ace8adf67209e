"""Smoke-drive the transport kernel on the baseline test-particle config."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("SMOKE_CPU", "1") == "1":
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp, numpy as np

from montecarloscattering_jl_tpu.utils import load_config
from montecarloscattering_jl_tpu.utils import constants as K
from montecarloscattering_jl_tpu.models.grid import setup_grid, find_feb_index
from montecarloscattering_jl_tpu.models.psd_bins import build_psd_bins
from montecarloscattering_jl_tpu.models.rankine_hugoniot import calc_rRH
from montecarloscattering_jl_tpu.models.fluxes import upstream_fluxes
from montecarloscattering_jl_tpu.models.profile import setup_profile
from montecarloscattering_jl_tpu.models.injection import init_pop
from montecarloscattering_jl_tpu.ops import step as stp
from montecarloscattering_jl_tpu.ops import state as stt

def main(n_pts=100, dont_scatter=False, dont_dsa=False, seed=3):
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "configs", "baseline.toml"))
    r_rh, g2 = calc_rRH(cfg.beta0, cfg.gamma0, cfg.species)
    x_grid_rg, x_start, x_stop = setup_grid(cfg.x_grid_start_rg, cfg.x_grid_stop_rg,
                                            cfg.use_prp, cfg.feb_downstream, cfg.rg0)
    x_grid_cm = x_grid_rg * cfg.rg0
    f_px, f_pz, f_en = upstream_fluxes(cfg.species, cfg.bmag0, cfg.theta_b0, cfg.u0, cfg.beta0, cfg.gamma0)
    prof = setup_profile(cfg.u0, cfg.beta0, cfg.gamma0, cfg.bmag0, cfg.theta_b0, r_rh,
                         cfg.bturb_comp_frac, cfg.bfield_amp, False, cfg.species,
                         f_px, f_en, x_grid_cm, x_grid_rg)
    bins = build_psd_bins(cfg.species, 1, cfg.energy_inj, cfg.emin_therm_fac, cfg.emax,
                          cfg.emax_per_aa, cfg.pmax, cfg.gamma0, 10, 10, 119, 4)
    nb = len(x_grid_cm)
    sp = cfg.species[0]
    rng = np.random.default_rng(seed)
    pop = init_pop(rng, cfg.species, 0, 1, cfg.energy_inj, True, n_pts, x_start, cfg.rg0, 1.0,
                   True, -1.0, cfg.beta0, cfg.gamma0, cfg.u0, x_grid_rg, prof.ux_sk, prof.gamma_sf)
    n = len(pop.ptot_pf)

    grids = stp.SegmentGrids(
        x_grid=jnp.asarray(x_grid_cm), ux=jnp.asarray(prof.ux_sk), uz=jnp.asarray(prof.uz_sk),
        utot=jnp.asarray(prof.utot), gamma_sf=jnp.asarray(prof.gamma_sf),
        gamma_ef=jnp.asarray(prof.gamma_ef), beta_ef=jnp.asarray(prof.beta_ef),
        btot=jnp.asarray(prof.btot), b_cos=jnp.cos(jnp.asarray(prof.theta)),
        b_sin=jnp.sin(jnp.asarray(prof.theta)),
        tcuts=jnp.asarray([np.inf]), x_spec=jnp.zeros(1))
    sc = stp.SegmentScalars(
        aa=jnp.asarray(1.0), abs_charge=jnp.asarray(K.QE_CGS), m=jnp.asarray(sp.mass),
        pcut=jnp.asarray(cfg.pcuts[0]), pcut_prev=jnp.asarray(0.0),
        pmax_cutoff=jnp.asarray(cfg.pmax),
        u2=jnp.asarray(cfg.u0 / r_rh), bmag2=jnp.asarray(prof.bmag2),
        b_cmbz=jnp.asarray(K.B_CMB0),
        gamma0_u0=jnp.asarray(cfg.gamma0 * cfg.u0), feb_up=jnp.asarray(cfg.feb_upstream),
        feb_dw=jnp.asarray(cfg.feb_downstream), x_grid_stop=jnp.asarray(x_stop),
        age_max=jnp.asarray(-1.0), pe_crit=jnp.asarray(cfg.pe_crit),
        gamma_e_crit=jnp.asarray(cfg.gamma_e_crit), inj_frac=jnp.asarray(1.0))
    ss = stp.StepStatic(
        eta_mfp=1.0, xn_per_coarse=cfg.xn_per_coarse, xn_per_fine=cfg.xn_per_fine,
        dont_scatter=dont_scatter, dont_dsa=dont_dsa, do_rad_losses=False, do_retro=False,
        do_tcuts=False, use_custom_eps_b=False, is_electron=False, n_xspec=0,
        i_grid_feb=find_feb_index(x_grid_cm, cfg.feb_upstream), nb=nb,
        psd_mom_min=bins.psd_mom_min, bins_per_dec_mom=10, n_mom=bins.n_mom,
        cos_fine=bins.cos_fine, dcos=bins.dcos, theta_min=bins.theta_min,
        bins_per_dec_theta=10, n_theta=bins.n_theta)

    key = jax.random.key(1)
    state = stt.init_state(pop.weight, pop.ptot_pf, pop.pb_pf, pop.x_cm, pop.i_grid,
                           prof.ux_sk[pop.i_grid], cfg.xn_per_fine, x_stop, key)
    tal = stt.make_tallies(nb, bins.n_mom, bins.n_theta, 0, 0, jnp.float64, batch=n, chunk=8)
    t0 = time.time()
    state2, tal2 = stp.run_segment_jit(state, tal, grids, sc, ss)
    jax.block_until_ready(state2)
    dt = time.time() - t0
    fin = stt.finalize_tallies(tal2)
    pxx = np.asarray(fin.pxx_flux); en = np.asarray(fin.energy_flux)
    print(f"{n} particles, segment {dt:.1f}s; statuses:",
          np.bincount(np.asarray(state2.status), minlength=3),
          "reasons:", np.bincount(np.asarray(state2.reason), minlength=5))
    print("steps max/mean:", int(state2.nsteps.max()), round(float(state2.nsteps.mean()),1))
    print("pxx/F_px bnd 60..75:", np.round(pxx[60:76]/f_px, 3))
    print("en/F_en  bnd 60..75:", np.round(en[60:76]/f_en, 3))
    print("psd totals: cr", float(fin.psd.sum()), " therm", float(fin.therm_psd.sum()))
    print("final x/rg0 pct:", np.percentile(np.asarray(state2.x)/cfg.rg0, [5,50,95]).round(3))
    return state2, fin, cfg, bins, f_px, f_en, r_rh

if __name__ == "__main__":
    main(n_pts=int(sys.argv[1]) if len(sys.argv) > 1 else 100)
